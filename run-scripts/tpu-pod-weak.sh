#!/bin/bash
# Weak-scaling campaign on TPU pods — counterpart of the reference's
# SC25 Frontier scripts (ref: run-scripts/SC25-job-weak.sh:9,35-44):
# fixed per-chip batch, growing slice size. Multibranch GFM-style training
# over several datasets with the arraystore-backed loaders.
#
# Usage: bash run-scripts/tpu-pod-weak.sh <tpu-name> <zone> <slice>   # e.g. v5e-64
set -euo pipefail

TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
SLICE=${3:?slice type, e.g. v5litepod-64}

# per-host process; jax.distributed.initialize() picks up the TPU runtime env
gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
  --command "
    cd ~/hydragnn_tpu &&
    HYDRAGNN_VALTEST=0 \
    python examples/multibranch/train.py \
      --num_epoch 10 \
      --batch_size \$((128 * \$(python -c 'import jax; jax.distributed.initialize(); print(jax.local_device_count())')))
  "
