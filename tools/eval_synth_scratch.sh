#!/bin/bash
# End-to-end quality loop for the from-scratch synthetic recipe
# (configs/synth_scratch.yaml): trainer checkpoint -> CFG sampler ->
# 4-stage eval harness on the held-out subjects (021, 022), mirroring the
# reference flow docs/eval.md:20-40 / eval/generate_all_facescape.py.
#
# Usage: tools/eval_synth_scratch.sh <run_dir e.g. /tmp/synth_scratch> [out_dir]
# Runs stage 2 on the default JAX platform (TPU when free); stages 1/3/4 are
# CPU-cheap. Writes metrics_{nvs,nes}.json + per-pair strips into <out_dir>.
set -euo pipefail
RUN=${1:?run dir (containing data/, flame/, logs/scratch/ckpt)}
OUT=${2:-$RUN/eval}
CKPT=$RUN/logs/scratch/ckpt
CFG=${CFG:-configs/synth_scratch.yaml}
STEPS=${STEPS:-50}
KPT_WEIGHTS=${KPT_WEIGHTS:-artifacts/landmark_net_synth.msgpack}
mkdir -p "$OUT"

# stage 1: deterministic input/target view selection on the held-out subjects
python -m morphablediffusion_tpu.apps.eval_select_views \
    --data_dir "$RUN/data" --subjects 021 022 --expressions 01 02 \
    --output "$OUT/views.json"

# stage 2: generate all target views — nvs (same-expression input) and
# nes (novel expression: input drawn from the *other* expression)
for MODE in nvs nes; do
  EXTRA=""
  [ "$MODE" = nes ] && EXTRA="--nes_exp 01 02"
  python -m morphablediffusion_tpu.apps.eval_generate \
      --data_dir "$RUN/data" --mode $MODE $EXTRA --cfg "$CFG" \
      --ckpt "$CKPT" --views_json "$OUT/views.json" \
      --output_dir "$OUT/gen_$MODE" --sample_steps "$STEPS"
done

# stage 3: 68-kpt prediction on GT views and generated strip tiles
python -m morphablediffusion_tpu.apps.eval_keypoints \
    --image_dir "$RUN/data" --output "$OUT/kpts_gt.json" \
    --backend native --weights "$KPT_WEIGHTS" --image_size 128 \
    --views_json "$OUT/views.json"
for MODE in nvs nes; do
  python -m morphablediffusion_tpu.apps.eval_keypoints \
      --image_dir "$OUT/gen_$MODE" --output "$OUT/kpts_$MODE.json" \
      --backend native --weights "$KPT_WEIGHTS" --image_size 128 \
      --strips --views_json "$OUT/views.json"
done

# stage 4: SSIM / PSNR / LPIPS / FID / PCK summary
for MODE in nvs nes; do
  # --fid_backend clip: torchmetrics' Inception weights can't be fetched on
  # a zero-egress box (EVAL.md §3); the CLIP-FID uses the run's own encoder
  python -m morphablediffusion_tpu.apps.eval_2d \
      --data_dir "$RUN/data" --generated_dir "$OUT/gen_$MODE" \
      --views_json "$OUT/views.json" --mode $MODE \
      --pred_kpts "$OUT/kpts_$MODE.json" --gt_kpts "$OUT/kpts_gt.json" \
      --image_size 128 --fid_backend clip --ckpt "$CKPT" --cfg "$CFG" \
      | tee "$OUT/metrics_$MODE.json"
done
