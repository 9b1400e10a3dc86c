#!/bin/bash
# In-the-wild avatar pipeline (reference parity: /root/reference/generate_face.sh).
#
# Stages 1+2 (host-side FLAME fitting) run the pinned third_party checkouts
# (bash third_party/setup_mesh_fitting.sh once — see third_party/README.md),
# followed by the identity retarget that replaces the reference's tracker
# patch; stage 3 is the TPU diffusion sampler. Skip fitting entirely by
# passing a ready mesh via MESH=path.ply.
#
# Usage: INPUT_IMG=demo/person.png EXP_IMG=demo/exp.png bash generate_face.sh
set -e

INPUT_IMG=${INPUT_IMG:-demo/input.png}
EXP_IMG=${EXP_IMG:-demo/exp.png}
OUTPUT_DIR=${OUTPUT_DIR:-output}
CKPT=${CKPT:-ckpt/facescape_flame.ckpt}
MICA_DIR=${MICA_DIR:-third_party/MICA}
TRACKER_DIR=${TRACKER_DIR:-third_party/metrical-tracker}
TRACKER_CFG=${TRACKER_CFG:-configs/actors/config.yml}
TRACKER_ACTOR=${TRACKER_ACTOR:-config}

if [ -z "$MESH" ]; then
    for d in "$MICA_DIR" "$TRACKER_DIR"; do
        [ -d "$d" ] || { echo "missing $d — run: bash third_party/setup_mesh_fitting.sh (or pass MESH=<fitted.ply>)"; exit 1; }
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
