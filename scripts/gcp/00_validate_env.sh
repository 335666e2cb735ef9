#!/usr/bin/env bash
# Validate GCP environment variables and tooling (reference scripts/gcp/00 parity).
set -euo pipefail

: "${GCP_PROJECT:?set GCP_PROJECT}"
: "${GCP_REGION:?set GCP_REGION (e.g. us-central1)}"
: "${GCS_BUCKET:?set GCS_BUCKET}"
: "${ARTIFACT_REGISTRY:?set ARTIFACT_REGISTRY (e.g. us-central1-docker.pkg.dev/PROJECT/repo)}"

command -v gcloud >/dev/null || { echo "gcloud not installed"; exit 1; }
command -v gsutil >/dev/null || { echo "gsutil not installed"; exit 1; }

gcloud config set project "$GCP_PROJECT" >/dev/null
echo "project:  $GCP_PROJECT"
echo "region:   $GCP_REGION"
echo "bucket:   gs://$GCS_BUCKET"
echo "registry: $ARTIFACT_REGISTRY"
gcloud auth list --filter=status:ACTIVE --format="value(account)" | head -1 \
  || { echo "no active gcloud auth"; exit 1; }
echo "environment OK"
