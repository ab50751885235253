#!/usr/bin/env bash
# Parameterized single run driven by env vars — mirrors the reference's
# search/run-single.sh contract ($DATASET, $EPOCHS, $LR, $MODEL, $CATEGORIES,
# $BUCKETS, $SIZE), without the PBS queue.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m tpulmi.cli \
  --dataset "${DATASET:-pca96v2}" \
  --size "${SIZE:-300K}" \
  --epochs "${EPOCHS:-12}" \
  --lr "${LR:-0.003}" \
  --model-type "${MODEL:-MLP-5}" \
  --n-categories "${CATEGORIES:-122}" \
  -bp ${BUCKETS:-4} \
  "$@"
