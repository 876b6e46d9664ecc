#!/bin/bash
# Real (unbounded) scene demo: 200^3 grid, linear-disparity sampling,
# data-pose mode, downsampled refine grid.
# Rebuild of reference bash_scripts/real_scenes/edit_demo_real.sh:22-46.
echo "Starting Run!"
gpu_num=0
while getopts g:d:p:e: flag; do
    case "${flag}" in
        g) gpu_num=${OPTARG};;
        d) scene_in=${OPTARG};;
        p) prompt_in=${OPTARG};;
        e) eidx_in=${OPTARG};;
    esac
done

scene=${scene_in:-pinecone}
prompt=${prompt_in:-"a pinecone wearing a knitted hat"}
eidx=${eidx_in:-6}

python train_sh_based_voxel_grid_with_posed_images.py -d ./data/${scene}/ \
    -o logs/rf/${scene}/ref/ \
    --grid_dims 200 200 200 \
    --render_num_samples_per_ray 416 \
    --train_num_samples_per_ray 416 \
    --linear_disparity_sampling=True \
    --learning_rate 0.005 \
    --white_bkgd=False \
    --sh_degree=0

# data_pose_mode now runs on the shear-warp fast path by default (r3):
# dataset poses render base-plane frames directly; --use_shear_warp=False
# reverts to the exact per-sample renderer
python edit_pretrained_relu_field.py \
    -d ./data/${scene}/ \
    -o logs/rf/${scene}/edit/ \
    -i logs/rf/${scene}/ref/saved_models/model_final.pth \
    -p "$prompt" \
    -eidx "$eidx" \
    --density_correlation_weight 60000 \
    --data_pose_mode=True \
    --downsample_refine_grid=True \
    --do_refinement=True

python render_sh_based_voxel_grid.py \
    -i logs/rf/${scene}/edit/saved_models/model_final_refined.pth \
    -o output_renders/${scene}/edit/
