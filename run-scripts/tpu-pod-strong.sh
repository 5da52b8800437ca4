#!/bin/bash
# Strong-scaling campaign — counterpart of ref: run-scripts/SC25-job-strong.sh:
# fixed global batch, growing slice size; reports edges/s and scaling
# efficiency vs the single-chip baseline (bench/scaling.py).
set -euo pipefail

TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
GLOBAL_BATCH=${3:-1024}

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
  --command "
    cd ~/hydragnn_tpu &&
    python bench/scaling.py --global_batch $GLOBAL_BATCH
  "
