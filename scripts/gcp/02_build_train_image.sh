#!/usr/bin/env bash
# Build + push the TPU training image (reference scripts/gcp/02 parity).
set -euo pipefail
source "$(dirname "$0")/00_validate_env.sh"
TAG="${1:-latest}"
gcloud builds submit --config cloudbuild.yaml \
  --substitutions "_REGISTRY=$ARTIFACT_REGISTRY,COMMIT_SHA=$TAG" .
