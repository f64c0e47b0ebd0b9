#!/bin/sh
# Hyperparameter sweep (the reference's `wandb sweep` + `wandb agent` role):
#   scripts/run_sweep.sh hyper.yaml tav_nn 8
exec python -m mme_tpu.cli.sweep "${1:?yaml}" --entry "${2:-tav_nn}" \
  --trials "${3:-4}" --dataset "${DATASET:-synthetic}"
