#!/bin/bash
# Fetch external assets (reference parity: download_data.sh).
# FLAME/MICA downloads need registered accounts at the respective sites;
# set FLAME_USERNAME / FLAME_PASSWORD in the environment first.
set -e

mkdir -p assets ckpt third_party/MICA/data

echo "== FLAME 2020 model (registration required: https://flame.is.tue.mpg.de) =="
if [ -n "$FLAME_USERNAME" ]; then
    wget --post-data "username=${FLAME_USERNAME}&password=${FLAME_PASSWORD}" \
        "https://download.is.tue.mpg.de/download.php?domain=flame&sfile=FLAME2020.zip&resume=1" \
        -O assets/FLAME2020.zip --no-check-certificate --continue
    unzip -o assets/FLAME2020.zip -d assets/FLAME2020
    wget --post-data "username=${FLAME_USERNAME}&password=${FLAME_PASSWORD}" \
        "https://download.is.tue.mpg.de/download.php?domain=flame&sfile=TextureSpace.zip&resume=1" \
        -O assets/TextureSpace.zip --no-check-certificate --continue
    unzip -o assets/TextureSpace.zip -d assets/TextureSpace
else
    echo "   skipped (set FLAME_USERNAME / FLAME_PASSWORD)"
fi

echo "== MICA pretrained weights =="
wget -c https://keeper.mpdl.mpg.de/f/db172dc4bd4f4c0f96de/?dl=1 \
    -O third_party/MICA/data/mica.tar || echo "   MICA download failed (optional)"

echo "== Pretrained morphable-diffusion checkpoints (Google Drive) =="
if command -v gdown >/dev/null; then
    gdown --fuzzy -O ckpt/facescape_flame.ckpt \
        "https://drive.google.com/uc?id=FACESCAPE_FLAME_CKPT_ID" || true
    gdown --fuzzy -O ckpt/thuman_smplx.ckpt \
        "https://drive.google.com/uc?id=THUMAN_SMPLX_CKPT_ID" || true
else
    echo "   gdown not installed; fetch checkpoints manually into ckpt/"
fi

echo "Done. Convert torch checkpoints at load time (utils/torch_import.py)"
