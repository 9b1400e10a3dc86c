#!/bin/bash
# Reference parity: /root/reference/train_face.sh (2-GPU DDP recipe ->
# all local TPU chips via the data mesh; batch is per host).
python -m morphablediffusion_tpu.apps.train -b configs/facescape.yaml \
    -l runs -n facescape "$@"
