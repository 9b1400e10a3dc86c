#!/bin/bash
# Reference parity: /root/reference/train_body.sh
python -m morphablediffusion_tpu.apps.train -b configs/thuman.yaml \
    -l runs -n thuman "$@"
