#!/bin/sh
# Flagship TAV fusion training (the reference's run_slurm/tav.sh role).
# On a multi-host pod, launch one copy per host; parallel/data.py shards
# the input per process.
exec python -m mme_tpu.cli.tav_nn \
  --dataset "${DATASET:-synthetic}" \
  -e "${EPOCHS:-6}" -b "${BATCH:-8}" -l "${LR:-5e-6}" \
  -ls NewCrossEntropy -es 2 -t 2 -p 7 "$@"
