#!/bin/bash
# Run the standalone refinement stage on an existing edited model
# (rebuild of reference bash_scripts/testing/refine_only.sh).
scene=${1:-dog2}
prompt=${2:-"a render of a dog with a party hat"}
eidx=${3:-9}
python refine_edited_relu_field.py \
    -d ./data/${scene}/ \
    -i logs/rf/${scene}/edit/saved_models/model_final.pth \
    -r logs/rf/${scene}/ref/saved_models/model_final.pth \
    -o logs/rf/${scene}/refine/ \
    -p "$prompt" -eidx "$eidx"
