#!/usr/bin/env bash
# Submit a Vertex AI custom training job on a TPU worker pool
# (reference scripts/gcp/04 submitted an L4 GPU job; TPU equivalent).
set -euo pipefail
source "$(dirname "$0")/00_validate_env.sh"

IMAGE=""
MODEL="graph_transformer_optimized"
MAX_EPOCHS=100
ACCEL="${TPU_TYPE:-TPU_V5e}"
ACCEL_COUNT="${TPU_COUNT:-8}"
REPLICAS="${TPU_REPLICAS:-1}"   # hosts; >1 => multi-host jax.distributed run
POLL=0

while [[ $# -gt 0 ]]; do
  case "$1" in
    --image) IMAGE="$2"; shift 2 ;;
    --model) MODEL="$2"; shift 2 ;;
    --max-epochs) MAX_EPOCHS="$2"; shift 2 ;;
    --replicas) REPLICAS="$2"; shift 2 ;;
    --poll) POLL=1; shift ;;
    *) echo "unknown arg $1"; exit 1 ;;
  esac
done
: "${IMAGE:?--image required}"

JOB_NAME="train-$MODEL-$(date +%Y%m%d-%H%M%S)"
# Multi-host: replica-count > 1 gives every replica the same container;
# on TPU pod slices jax.distributed.initialize() autodetects the topology
# from the TPU metadata (train_baseline.py --distributed auto). On non-TPU
# pools Vertex injects CLUSTER_SPEC, which the trainer also autodetects.
gcloud ai custom-jobs create \
  --region="$GCP_REGION" \
  --display-name="$JOB_NAME" \
  --worker-pool-spec="machine-type=ct5lp-hightpu-8t,accelerator-type=$ACCEL,accelerator-count=$ACCEL_COUNT,replica-count=$REPLICAS,container-image-uri=$IMAGE" \
  --args="--model,$MODEL,--max-epochs,$MAX_EPOCHS,--gcs-bucket,$GCS_BUCKET,--distributed,auto"

if [[ "$POLL" == 1 ]]; then
  JOB_ID=$(gcloud ai custom-jobs list --region="$GCP_REGION" \
    --filter="displayName=$JOB_NAME" --format="value(name)" | head -1)
  echo "polling $JOB_ID"
  while true; do
    STATE=$(gcloud ai custom-jobs describe "$JOB_ID" --region="$GCP_REGION" --format="value(state)")
    echo "state: $STATE"
    case "$STATE" in
      JOB_STATE_SUCCEEDED) exit 0 ;;
      JOB_STATE_FAILED|JOB_STATE_CANCELLED) exit 1 ;;
    esac
    sleep 60
  done
fi
