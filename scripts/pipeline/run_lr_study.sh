#!/usr/bin/env bash
# Symmetric lr-protocol study (round 5, VERDICT r4 missing #3 / next #1):
# the round-4 GAT-inversion resolution compared GAT@3e-4 against SAGE@1e-3 —
# an asymmetric protocol. This reruns GraphSAGE, GT-optimized and GT(+FFN)
# at lr 3e-4 on corpus v3 with the same budget so the per-model-tuned
# ordering claim in docs/EXPERIMENTS.md rests on like-for-like numbers
# (reference protocol: /root/reference/docs/EXPERIMENTS.md:38-41).
set -euo pipefail
cd "$(dirname "$0")/../.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

DATA_DIR=${DATA_DIR:-data_refscale}
OUT=${OUT:-outputs/refscale_v3_gatdiag/lr3e-4}
EPOCHS=${EPOCHS:-60}
MODELS=${MODELS:-"graphsage graph_transformer_optimized graph_transformer"}

for model in $MODELS; do
  if [ -f "$OUT/$model/history.json" ]; then
    echo "[$(date +%H:%M:%S)] $model already trained, skipping"
    continue
  fi
  echo "[$(date +%H:%M:%S)] training $model @ lr 3e-4"
  python scripts/train/train_baseline.py --model "$model" \
    --train-sessions "$DATA_DIR/processed/train.csv" \
    --val-sessions "$DATA_DIR/processed/val.csv" \
    --graph-edges "$DATA_DIR/processed/graph_edges.csv" \
    --lr 3e-4 --max-epochs "$EPOCHS" --checkpoint-every 10 --record-hits \
    --output-dir "$OUT"
done
echo "[$(date +%H:%M:%S)] LR STUDY DONE"
