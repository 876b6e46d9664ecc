#!/bin/bash
# Unattended dog2 quality demo — one pipeline from recon to metrics CSV, run
# the moment converted SD weights exist (this image is zero-egress, so weights
# must be staged manually).
#
# Usage:
#   SD_WEIGHTS_DIR=/path/to/sd-2.0-converted \
#   SD14_WEIGHTS_DIR=/path/to/sd-1.4-converted \   # optional (local edit leg)
#   CLIP_MODEL_DIR=/path/to/clip \                 # optional (CLIP-sim eval)
#   bash bash_scripts/run_demo_when_weights_ready.sh [data_dir] [out_root]
#
# Weights-dir layout (produced by tools/import + HF snapshot):
#   text_encoder/*.safetensors  vae/*.safetensors  unet/*.safetensors
#   tokenizer/vocab.json + merges.txt
# Validate first: python tools/validate_sd_weights.py -d $SD_WEIGHTS_DIR
#
# Pipeline (reference bash_scripts/edit_demo_global.sh + edit_demo_local.sh +
# evaluation/calculate_metrics.py):
#   1. reconstruct dog2 (skipped if a recon checkpoint already exists)
#   2. global SDS edit: "a render of a yarn doll of a light gray dog"
#   3. local SDS edit + refinement: "a render of a dog wearing a party hat"
#      (only when SD14_WEIGHTS_DIR is staged — refinement uses SD 1.4,
#      reference attn_grid_trainer.py:154)
#   4. turntable renders of ref + both edited models (PNG frames + prompt.txt)
#   5. quality-metrics CSV — ALWAYS runs (PSNR is weight-free); CLIP columns
#      fill in when CLIP_MODEL_DIR is staged, FID when INCEPTION_MODEL_DIR is
#
# TINY=1 runs the IDENTICAL script path end-to-end at plumbing scale (random
# tiny-SD weights, hash tokenizer, few iterations) — this is what CI
# exercises (tests/test_demo_script.py), so the unattended run cannot rot.
set -euo pipefail

cd "$(dirname "$0")/.."

DATA_DIR=${1:-./data/dog2}
OUT_ROOT=${2:-logs/rf/dog2}
PROMPT="a render of a yarn doll of a light gray dog"
LOCAL_PROMPT="a render of a dog wearing a party hat"
LOCAL_EDIT_IDX="9"   # "hat" (reference edit_demo_local.sh: eidx 9)
LOG_NAME=yarn
LOCAL_LOG_NAME=party_hat

if [ "${TINY:-0}" = "1" ]; then
    SD_VERSION=tiny
    SD_WEIGHTS_ARGS=()
    # fast_debug_mode stays OFF so the held-out eval runs each stage — with
    # $VOXE_LPIPS_WEIGHTS_DIR staged it computes perceptual LPIPS exactly as
    # the unattended run would (reference testers.py:17-71)
    RECON_ARGS=(--grid_dims 16 16 16 --num_stages 2 --num_iterations_per_stage 30
                --train_num_samples_per_ray 24 --render_num_samples_per_ray 24
                --parallel_rays_chunk_size 2048 --ray_batch_size 1024
                --feedback_frequency 30 --test_frequency 30
                --fast_debug_mode False --separate_train_test_folders False)
    EDIT_ARGS=(--num_iterations_edit 4 --render_num_samples_per_ray 24
               --parallel_rays_chunk_size 2048 --feedback_frequency 4
               --save_frequency 4 --separate_train_test_folders False)
    LOCAL_ARGS=(--num_iterations_refine 2 --timestamp 2)
    RENDER_ARGS=(--num_frames 4 --render_scale_factor 1.0 --overridden_num_samples_per_ray 24)
    echo "== stage 0: SD sanity image (tiny random weights, glue check) =="
    python tools/validate_sd_weights.py --sd_version tiny --run_smoke False \
        --sanity_image "$OUT_ROOT/sd_sanity_image.png" --sanity_steps 2
else
    SD_VERSION=2.0
    if [ -z "${SD_WEIGHTS_DIR:-}" ] || [ ! -d "$SD_WEIGHTS_DIR/unet" ]; then
        echo "SD_WEIGHTS_DIR not staged (need unet/vae/text_encoder/tokenizer subdirs)" >&2
        exit 2
    fi
    echo "== stage 0: validate weights + SD sanity image =="
    python tools/validate_sd_weights.py -d "$SD_WEIGHTS_DIR" --sd_version 2.0 \
        --sanity_image "$OUT_ROOT/sd_sanity_image.png"
    SD_WEIGHTS_ARGS=(--sd_weights_dir "$SD_WEIGHTS_DIR")
    RECON_ARGS=()
    EDIT_ARGS=()
    LOCAL_ARGS=()
    RENDER_ARGS=()
    if [ -n "${SD14_WEIGHTS_DIR:-}" ]; then
        # refinement runs SD 1.4 (reference attn_grid_trainer.py:154) — its
        # weights tree is separate from the SD-2.0 one and validated as 1.4
        python tools/validate_sd_weights.py -d "$SD14_WEIGHTS_DIR" --sd_version 1.4
        LOCAL_ARGS+=(--sd_refine_weights_dir "$SD14_WEIGHTS_DIR")
    fi
fi

REF_MODEL="$OUT_ROOT/ref/saved_models/model_final.pth"
if [ ! -f "$REF_MODEL" ]; then
    echo "== stage 1: reconstruction =="
    python train_sh_based_voxel_grid_with_posed_images.py \
        -d "$DATA_DIR" -o "$OUT_ROOT/ref/" "${RECON_ARGS[@]}"
fi

echo "== stage 2: global SDS edit ($PROMPT) =="
python edit_pretrained_relu_field.py \
    -d "$DATA_DIR" \
    -o "$OUT_ROOT/$LOG_NAME/" \
    -i "$REF_MODEL" \
    -p "$PROMPT" \
    --sd_version "$SD_VERSION" \
    "${SD_WEIGHTS_ARGS[@]}" "${EDIT_ARGS[@]}" \
    --log_wandb=False

if [ "${TINY:-0}" = "1" ] || [ -n "${SD14_WEIGHTS_DIR:-}" ]; then
    echo "== stage 3: local SDS edit + refinement ($LOCAL_PROMPT) =="
    python edit_pretrained_relu_field.py \
        -d "$DATA_DIR" \
        -o "$OUT_ROOT/$LOCAL_LOG_NAME/" \
        -i "$REF_MODEL" \
        -p "$LOCAL_PROMPT" \
        -eidx "$LOCAL_EDIT_IDX" \
        --do_refinement True \
        --sd_version "$SD_VERSION" \
        "${SD_WEIGHTS_ARGS[@]}" "${EDIT_ARGS[@]}" "${LOCAL_ARGS[@]}" \
        --log_wandb=False
else
    echo "SD14_WEIGHTS_DIR not staged -> skipping local-edit/refinement leg"
fi

echo "== stage 4: turntable renders (PNG frames feed the metrics stage) =="
python render_sh_based_voxel_grid.py \
    -i "$REF_MODEL" \
    -o "$OUT_ROOT/renders/ref/" "${RENDER_ARGS[@]}" \
    --save_freq 1 -p "a render of a light gray dog"
python render_sh_based_voxel_grid.py \
    -i "$OUT_ROOT/$LOG_NAME/saved_models/model_final.pth" \
    -o "$OUT_ROOT/renders/$LOG_NAME/" "${RENDER_ARGS[@]}" \
    --save_freq 1 -p "$PROMPT"
if [ -f "$OUT_ROOT/$LOCAL_LOG_NAME/saved_models/model_final_refined.pth" ]; then
    python render_sh_based_voxel_grid.py \
        -i "$OUT_ROOT/$LOCAL_LOG_NAME/saved_models/model_final_refined.pth" \
        -o "$OUT_ROOT/renders/$LOCAL_LOG_NAME/" "${RENDER_ARGS[@]}" \
        --save_freq 1 -p "$LOCAL_PROMPT"
fi

echo "== stage 5: quality metrics (CLIP-sim / FID / PSNR -> CSV) =="
# assemble the reference's results layout (<scene>/{inputs,recon,<prompt>}/,
# evaluation/calculate_metrics.py:56-148) from the stage-4 frames. PSNR is
# always computed; CLIP/FID columns need their staged weight dirs.
METRICS_DIR="$OUT_ROOT/metrics/dog2"
mkdir -p "$METRICS_DIR/inputs" "$METRICS_DIR/recon" \
    "$METRICS_DIR/$LOG_NAME" "$METRICS_DIR/$LOCAL_LOG_NAME"
find "$DATA_DIR" -name '*.png' | head -8 | while read -r f; do
    cp "$f" "$METRICS_DIR/inputs/"
done
cp "$OUT_ROOT/renders/ref/"*.png "$OUT_ROOT/renders/ref/prompt.txt" "$METRICS_DIR/recon/"
cp "$OUT_ROOT/renders/$LOG_NAME/"*.png "$OUT_ROOT/renders/$LOG_NAME/prompt.txt" \
    "$METRICS_DIR/$LOG_NAME/"
if [ -f "$OUT_ROOT/renders/$LOCAL_LOG_NAME/prompt.txt" ]; then
    cp "$OUT_ROOT/renders/$LOCAL_LOG_NAME/"*.png \
        "$OUT_ROOT/renders/$LOCAL_LOG_NAME/prompt.txt" "$METRICS_DIR/$LOCAL_LOG_NAME/"
else
    rmdir "$METRICS_DIR/$LOCAL_LOG_NAME"
fi
python evaluation/calculate_metrics.py \
    -d "$OUT_ROOT/metrics/" \
    ${CLIP_MODEL_DIR:+--clip_model_dir "$CLIP_MODEL_DIR"} \
    ${INCEPTION_MODEL_DIR:+--inception_model_dir "$INCEPTION_MODEL_DIR"}
echo "demo complete."
