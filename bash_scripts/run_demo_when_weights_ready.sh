#!/bin/bash
# Unattended dog2 "yarn" quality demo — runs the moment converted SD weights
# exist (this image is zero-egress, so weights must be staged manually).
#
# Usage:
#   SD_WEIGHTS_DIR=/path/to/sd-2.0-converted \
#   SD14_WEIGHTS_DIR=/path/to/sd-1.4-converted \   # optional (refinement)
#   CLIP_MODEL_DIR=/path/to/clip \                 # optional (CLIP-sim eval)
#   bash bash_scripts/run_demo_when_weights_ready.sh [data_dir] [out_root]
#
# Weights-dir layout (produced by tools/import + HF snapshot):
#   text_encoder/*.safetensors  vae/*.safetensors  unet/*.safetensors
#   tokenizer/vocab.json + merges.txt
# Validate first: python tools/validate_sd_weights.py -d $SD_WEIGHTS_DIR
#
# Pipeline (reference bash_scripts/edit_demo_global.sh + calculate_metrics):
#   1. reconstruct dog2 (skipped if a recon checkpoint already exists)
#   2. SDS edit with prompt "a render of a yarn doll of a light gray dog"
#   3. turntable render of ref + edited models
#   4. CLIP-sim / FID / PSNR metrics when CLIP_MODEL_DIR is staged
set -euo pipefail

DATA_DIR=${1:-./data/dog2}
OUT_ROOT=${2:-logs/rf/dog2}
PROMPT="a render of a yarn doll of a light gray dog"
LOG_NAME=yarn

if [ -z "${SD_WEIGHTS_DIR:-}" ] || [ ! -d "$SD_WEIGHTS_DIR/unet" ]; then
    echo "SD_WEIGHTS_DIR not staged (need unet/vae/text_encoder/tokenizer subdirs)" >&2
    exit 2
fi

python tools/validate_sd_weights.py -d "$SD_WEIGHTS_DIR" --sd_version 2.0

REF_MODEL="$OUT_ROOT/ref/saved_models/model_final.pth"
if [ ! -f "$REF_MODEL" ]; then
    echo "== stage 1: reconstruction =="
    python train_sh_based_voxel_grid_with_posed_images.py \
        -d "$DATA_DIR" -o "$OUT_ROOT/ref/"
fi

echo "== stage 2: SDS edit ($PROMPT) =="
python edit_pretrained_relu_field.py \
    -d "$DATA_DIR" \
    -o "$OUT_ROOT/$LOG_NAME/" \
    -i "$REF_MODEL" \
    -p "$PROMPT" \
    --sd_version 2.0 \
    --sd_weights_dir "$SD_WEIGHTS_DIR" \
    --log_wandb=False

echo "== stage 3: turntable renders =="
python render_sh_based_voxel_grid.py \
    -i "$REF_MODEL" \
    -o "output_renders/dog2/ref/"
python render_sh_based_voxel_grid.py \
    -i "$OUT_ROOT/$LOG_NAME/saved_models/model_final.pth" \
    -o "output_renders/dog2/$LOG_NAME/"

if [ -n "${CLIP_MODEL_DIR:-}" ]; then
    echo "== stage 4: CLIP-sim / FID metrics =="
    python evaluation/calculate_metrics.py \
        -d "output_renders/dog2/" \
        --clip_model_dir "$CLIP_MODEL_DIR" \
        ${INCEPTION_MODEL_DIR:+--inception_model_dir "$INCEPTION_MODEL_DIR"}
else
    echo "CLIP_MODEL_DIR not staged -> skipping CLIP-sim/FID stage"
fi
echo "demo complete."
