#!/bin/bash
# Parameterized ablation-sweep driver.
#
# The reference ships 17 near-identical sweep scripts
# (bash_scripts/sweeps/sweep_full_{global,local}[_3d_l1|_3d_l2|_fcl|
# _uncoupled|_uncoupled_l2].sh); this driver covers the same matrix with two
# flags:  -m <mode>  one of: dcl | l1 | l2 | fcl | uncoupled | uncoupled_l2
#         -l         local mode (adds refinement)
#         -d <scene> scene name (repeatable via env SCENES="a b c")
# Loss-mode flag translation matches the reference scripts.
echo "Starting Sweep!"
mode=dcl; local_mode=false; scenes_in=""
while getopts m:d:l flag; do
    case "${flag}" in
        m) mode=${OPTARG};;
        d) scenes_in=${OPTARG};;
        l) local_mode=true;;
    esac
done
SCENES=${SCENES:-${scenes_in:-dog2}}

loss_flags=""
case "$mode" in
    dcl)          loss_flags="";;
    l1)           loss_flags="--l1_mode=True";;
    l2)           loss_flags="--l2_mode=True";;
    fcl)          loss_flags="--feature_correlation_weight=1.0";;
    uncoupled)    loss_flags="--uncoupled_mode=True --data_pose_mode=True";;
    uncoupled_l2) loss_flags="--uncoupled_mode=True --data_pose_mode=True --uncoupled_l2_mode=True";;
    *) echo "unknown mode $mode"; exit 1;;
esac
refine_flags="--do_refinement=False"
if $local_mode; then refine_flags="--do_refinement=True"; fi

run_one() {  # scene prompt log_name eidx
    python edit_pretrained_relu_field.py \
        -d ./data/${1}/ \
        -o logs/rf/sweep_${mode}/${1}/${3} \
        -i logs/rf/${1}/ref/saved_models/model_final.pth \
        -p "$2" -eidx "${4}" \
        $loss_flags $refine_flags \
        --learning_rate=0.028 --post_process_scc=False --sh_degree=0

    python render_sh_based_voxel_grid.py \
        -i logs/rf/sweep_${mode}/${1}/${3}/saved_models/model_final.pth \
        -o output_renders/sweep_${mode}/${1}/${3}/ \
        --sds_prompt="$2" --save_freq=10
}

for scene in $SCENES; do
    run_one $scene "a render of a wood carving of a $scene" "wood" 9
    run_one $scene "a render of a yarn doll of a $scene" "yarn" 9
done
