#!/bin/sh
# Text-only classifier (the reference's run_text_only_NN.sh).
exec python -m mme_tpu.cli.text_nn -m "${MODEL:-Bert}" \
  --dataset "${DATASET:-synthetic}" -e "${EPOCHS:-3}" -b "${BATCH:-32}" "$@"
