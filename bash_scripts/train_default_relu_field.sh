#!/bin/bash
# Reconstruct a default relu/softplus field for a scene.
# Rebuild of reference bash_scripts/train_default_relu_field.sh (the GPU pinning
# flag becomes a no-op on TPU; kept for interface parity).
echo "Starting Run!"
gpu_num=0
while getopts g:d: flag; do
    case "${flag}" in
        g) gpu_num=${OPTARG};;
        d) scene_in=${OPTARG};;
    esac
done
echo "Running on device: $gpu_num"

train_default() {
    echo "Starting Training..."
    python train_sh_based_voxel_grid_with_posed_images.py -d ./data/${1}/ \
        -o logs/rf/${1}/ref/ \
        --fast_debug_mode=True \
        --sh_degree=0
}

scene=$scene_in
train_default $scene
