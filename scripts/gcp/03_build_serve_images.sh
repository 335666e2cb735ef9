#!/usr/bin/env bash
# Build + push the serving images (reference scripts/gcp/03 parity).
set -euo pipefail
source "$(dirname "$0")/00_validate_env.sh"
TAG="${1:-latest}"
gcloud builds submit --config cloudbuild-serve.yaml \
  --substitutions "_REGISTRY=$ARTIFACT_REGISTRY,COMMIT_SHA=$TAG" .
