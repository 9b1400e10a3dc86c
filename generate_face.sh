#!/bin/bash
# In-the-wild avatar pipeline (reference parity: /root/reference/generate_face.sh).
#
# Stages 1+2 (FLAME mesh fitting) run IN-TREE by default via
# morphablediffusion_tpu.apps.fit_face — identity from INPUT_IMG,
# expression/pose from EXP_IMG, fitted with the repo's own JAX FLAME stack
# (fitting/). Only the user-downloaded FLAME2020 assets are needed
# (download_data.sh), so the whole pipeline runs on a zero-egress machine —
# the reference instead vendors MICA + metrical-tracker checkouts.
#
# FITTER=external switches to the pinned MICA/metrical-tracker checkouts
# (bash third_party/setup_mesh_fitting.sh once; third_party/README.md) for
# reference-exact identity prediction. Skip fitting entirely by passing a
# ready mesh via MESH=path.ply.
#
# Usage: INPUT_IMG=demo/person.png EXP_IMG=demo/exp.png bash generate_face.sh
set -e

INPUT_IMG=${INPUT_IMG:-demo/input.png}
EXP_IMG=${EXP_IMG:-demo/exp.png}
OUTPUT_DIR=${OUTPUT_DIR:-output}
CKPT=${CKPT:-ckpt/facescape_flame.ckpt}
FITTER=${FITTER:-intree}
FLAME_PKL=${FLAME_PKL:-assets/FLAME2020/generic_model.pkl}
FLAME_LMK=${FLAME_LMK:-assets/landmark_embedding.npy}
KPT_WEIGHTS=${KPT_WEIGHTS:-}
MICA_DIR=${MICA_DIR:-third_party/MICA}
TRACKER_DIR=${TRACKER_DIR:-third_party/metrical-tracker}
TRACKER_CFG=${TRACKER_CFG:-configs/actors/config.yml}
TRACKER_ACTOR=${TRACKER_ACTOR:-config}

if [ -z "$MESH" ] && [ "$FITTER" = "intree" ]; then
    [ -f "$FLAME_PKL" ] || { echo "missing $FLAME_PKL — run download_data.sh (FLAME registration required), or use FITTER=external / MESH=<fitted.ply>"; exit 1; }
    mkdir -p "$OUTPUT_DIR"
    python -m morphablediffusion_tpu.apps.fit_face \
        --input_img "$INPUT_IMG" --exp_img "$EXP_IMG" \
        --flame "$FLAME_PKL" --lmk_embedding "$FLAME_LMK" \
        ${KPT_WEIGHTS:+--kpt_weights "$KPT_WEIGHTS"} \
        ${INPUT_LANDMARKS:+--input_landmarks "$INPUT_LANDMARKS"} \
        ${EXP_LANDMARKS:+--exp_landmarks "$EXP_LANDMARKS"} \
        --out "$OUTPUT_DIR/fitted_mesh.ply"
    MESH="$OUTPUT_DIR/fitted_mesh.ply"
elif [ -z "$MESH" ]; then
    for d in "$MICA_DIR" "$TRACKER_DIR"; do
        [ -d "$d" ] || { echo "missing $d — run: bash third_party/setup_mesh_fitting.sh (or use FITTER=intree / MESH=<fitted.ply>)"; exit 1; }
    done
    ABS_OUT=$(cd "$(dirname "$OUTPUT_DIR")" 2>/dev/null && pwd)/$(basename "$OUTPUT_DIR") || ABS_OUT=$PWD/$OUTPUT_DIR
    mkdir -p "$ABS_OUT"
    ABS_INPUT=$(realpath "$INPUT_IMG"); ABS_EXP=$(realpath "$EXP_IMG")

    # 1) FLAME identity codes for both photos (MICA)
    (cd "$MICA_DIR" && python demo.py -i "$ABS_INPUT" -o "$ABS_OUT/mica/input")
    (cd "$MICA_DIR" && python demo.py -i "$ABS_EXP" -o "$ABS_OUT/mica/exp")

    # 2) fit FLAME pose/expression to the expression photo
    (cd "$TRACKER_DIR" && python tracker.py --cfg "$TRACKER_CFG")

    # 2b) retarget the tracked expression onto the input identity
    #     (replaces the reference's tracker patch; third_party/README.md)
    FRAME=$(ls "$TRACKER_DIR/output/$TRACKER_ACTOR/checkpoint/"*.frame | head -1)
    IDENTITY=$(find "$ABS_OUT/mica/input" -name identity.npy | head -1)
    python third_party/retarget_identity.py \
        --tracker_dir "$TRACKER_DIR" --frame "$FRAME" \
        --identity "$IDENTITY" --out "$ABS_OUT/fitted_mesh.ply"
    MESH="$ABS_OUT/fitted_mesh.ply"
fi

# 3) 16-view synchronized diffusion on TPU
python -m morphablediffusion_tpu.apps.generate_face \
    --input_img "$INPUT_IMG" --exp_img "$EXP_IMG" --mesh "$MESH" \
    --ckpt "$CKPT" --output_dir "$OUTPUT_DIR" "$@"
