#!/bin/bash
# In-the-wild avatar pipeline (reference parity: /root/reference/generate_face.sh).
#
# Stage 1+2 (host-side mesh fitting) are external torch tools, exactly as in
# the reference: MICA predicts FLAME identity from the input photo, then the
# metrical-tracker fits pose/expression to the expression photo. Install them
# from their upstream repos and set MICA_DIR / TRACKER_DIR, or skip both by
# passing a ready mesh via MESH=path.ply.
#
# Usage: INPUT_IMG=demo/person.png EXP_IMG=demo/exp.png bash generate_face.sh
set -e

INPUT_IMG=${INPUT_IMG:-demo/input.png}
EXP_IMG=${EXP_IMG:-demo/exp.png}
OUTPUT_DIR=${OUTPUT_DIR:-output}
CKPT=${CKPT:-ckpt/facescape_flame.ckpt}

if [ -z "$MESH" ]; then
    : "${MICA_DIR:?set MICA_DIR (github.com/Zielon/MICA) or pass MESH=<fitted.ply>}"
    : "${TRACKER_DIR:?set TRACKER_DIR (github.com/Zielon/metrical-tracker) or pass MESH=<fitted.ply>}"
    # 1) FLAME identity from the input photo
    (cd "$MICA_DIR" && python demo.py -i "$INPUT_IMG" -o "$OUTPUT_DIR/mica")
    # 2) fit pose/expression to the expression photo using the MICA shape
    (cd "$TRACKER_DIR" && python tracker.py --cfg configs/actors/config.yml)
    MESH="$TRACKER_DIR/output/config/mesh/00001.ply"
fi

# 3) 16-view synchronized diffusion on TPU
python -m morphablediffusion_tpu.apps.generate_face \
    --input_img "$INPUT_IMG" --exp_img "$EXP_IMG" --mesh "$MESH" \
    --ckpt "$CKPT" --output_dir "$OUTPUT_DIR" "$@"
