#!/usr/bin/env bash
# Register model + deploy endpoint with A/B traffic split
# (reference scripts/gcp/06 parity).
set -euo pipefail
source "$(dirname "$0")/00_validate_env.sh"

ENVIRONMENT="staging"
TRAFFIC=10
while [[ $# -gt 0 ]]; do
  case "$1" in
    --environment) ENVIRONMENT="$2"; shift 2 ;;
    --traffic-percent) TRAFFIC="$2"; shift 2 ;;
    *) echo "unknown arg $1"; exit 1 ;;
  esac
done

MODEL_NAME="recsys-$ENVIRONMENT"
ENDPOINT_NAME="recsys-endpoint-$ENVIRONMENT"
SERVE_IMAGE="${SERVE_IMAGE:-$ARTIFACT_REGISTRY/serve:latest}"

MODEL_ID=$(gcloud ai models upload --region="$GCP_REGION" \
  --display-name="$MODEL_NAME" \
  --container-image-uri="$SERVE_IMAGE" \
  --container-predict-route=/predict --container-health-route=/health \
  --artifact-uri="gs://$GCS_BUCKET/checkpoints/candidate" \
  --format="value(model)" 2>/dev/null | tail -1)

ENDPOINT_ID=$(gcloud ai endpoints list --region="$GCP_REGION" \
  --filter="displayName=$ENDPOINT_NAME" --format="value(name)" | head -1)
if [[ -z "$ENDPOINT_ID" ]]; then
  ENDPOINT_ID=$(gcloud ai endpoints create --region="$GCP_REGION" \
    --display-name="$ENDPOINT_NAME" --format="value(name)")
fi

# Canary: new model gets $TRAFFIC percent, previous deployment keeps the rest.
gcloud ai endpoints deploy-model "$ENDPOINT_ID" --region="$GCP_REGION" \
  --model="$MODEL_ID" --display-name="$MODEL_NAME-$(date +%s)" \
  --machine-type=n1-standard-4 --min-replica-count=1 --max-replica-count=3 \
  --traffic-split="0=$((100 - TRAFFIC)),$MODEL_ID=$TRAFFIC" || \
gcloud ai endpoints deploy-model "$ENDPOINT_ID" --region="$GCP_REGION" \
  --model="$MODEL_ID" --display-name="$MODEL_NAME-$(date +%s)" \
  --machine-type=n1-standard-4 --traffic-split="$MODEL_ID=100"
echo "deployed $MODEL_ID to $ENDPOINT_ID ($TRAFFIC% traffic)"
