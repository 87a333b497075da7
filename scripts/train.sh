#!/bin/bash
# Launch a training run: ./scripts/train.sh <method> [extra args...]
# Reference: /root/reference/train.sh (Slurm wrapper; here a plain launcher)
set -e
METHOD=$1; shift
python -m floodseg_tpu.cli.main fit \
    --config configs/train_base.yaml \
    --config configs/train_${METHOD}.yaml \
    --config configs/dataset_flow.yaml \
    --method ${METHOD} "$@"
