#!/bin/bash
# Run graph-cut segmentation only, from trained attn grids
# (rebuild of reference bash_scripts/testing/edit_demo_local_real_segment_only.sh).
scene=${1:-dog2}
python segment_attn_relu_field.py \
    -d ./data/${scene}/ \
    -ie logs/rf/${scene}/refine/saved_models/model_final_attn_edit.pth \
    -io logs/rf/${scene}/refine/saved_models/model_final_attn_object.pth \
    -i logs/rf/${scene}/edit/saved_models/model_final.pth \
    -r logs/rf/${scene}/ref/saved_models/model_final.pth \
    -o logs/rf/${scene}/segment/
