#!/usr/bin/env bash
# Upload trained artifacts to GCS (reference scripts/gcp/05 parity).
set -euo pipefail
source "$(dirname "$0")/00_validate_env.sh"

MODEL_DIR="${1:-outputs/graph_transformer_optimized}"
DEST="gs://$GCS_BUCKET/checkpoints/candidate"

python scripts/pipeline/export_onnx.py --mode production \
  --checkpoint "$MODEL_DIR/checkpoint_best" --output-dir exports

gsutil -m cp -r "$MODEL_DIR/checkpoint_best" "$DEST/"
gsutil -m cp exports/item_embeddings.npy exports/model_metadata.json "$DEST/"
echo "uploaded to $DEST"
