#!/bin/bash
# Evaluate a run: ./scripts/test.sh <method> <run_dir> [extra args...]
set -e
METHOD=$1; RUN=$2; shift 2
python -m floodseg_tpu.cli.main test \
    --config configs/train_base.yaml \
    --config configs/train_${METHOD}.yaml \
    --config configs/dataset_flow.yaml \
    --method ${METHOD} --ckpt_path ${RUN}/checkpoints/last "$@"
