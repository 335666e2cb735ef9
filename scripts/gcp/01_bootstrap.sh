#!/usr/bin/env bash
# Bootstrap bucket / artifact registry / service account (reference scripts/gcp/01 parity).
set -euo pipefail
source "$(dirname "$0")/00_validate_env.sh"

SA_NAME="${SA_NAME:-recsys-trainer}"
SA_EMAIL="$SA_NAME@$GCP_PROJECT.iam.gserviceaccount.com"
AR_REPO="${ARTIFACT_REGISTRY##*/}"

gcloud services enable aiplatform.googleapis.com storage.googleapis.com \
  artifactregistry.googleapis.com cloudbuild.googleapis.com

gsutil ls -b "gs://$GCS_BUCKET" >/dev/null 2>&1 || \
  gsutil mb -l "$GCP_REGION" "gs://$GCS_BUCKET"

gcloud artifacts repositories describe "$AR_REPO" --location="$GCP_REGION" >/dev/null 2>&1 || \
  gcloud artifacts repositories create "$AR_REPO" --location="$GCP_REGION" \
    --repository-format=docker

gcloud iam service-accounts describe "$SA_EMAIL" >/dev/null 2>&1 || \
  gcloud iam service-accounts create "$SA_NAME" --display-name "Recsys trainer"

for role in roles/aiplatform.user roles/storage.objectAdmin \
            roles/artifactregistry.reader roles/logging.logWriter \
            roles/monitoring.metricWriter; do
  gcloud projects add-iam-policy-binding "$GCP_PROJECT" \
    --member "serviceAccount:$SA_EMAIL" --role "$role" --condition=None >/dev/null
done
echo "bootstrap complete ($SA_EMAIL)"
