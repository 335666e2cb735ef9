#!/usr/bin/env bash
# Submit the flagship training job (reference submit_graph_transformer_optimized.sh
# parity; reference used an L4 g2-standard-8 Vertex job — this targets a TPU pool).
set -euo pipefail

TAG="${1:-latest}"
bash scripts/gcp/02_build_train_image.sh "$TAG"
bash scripts/gcp/04_submit_training.sh \
  --image "$ARTIFACT_REGISTRY/train:$TAG" \
  --model graph_transformer_optimized \
  --max-epochs 100 \
  --poll
