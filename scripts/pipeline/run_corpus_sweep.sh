#!/usr/bin/env bash
# Corpus-v2 ceiling sweep (round 4): find structured-generator settings whose
# learnable ceiling clears the reference quality-gate floors (r@10>=0.30 —
# /root/reference/configs/quality_thresholds.yaml) while still discriminating
# between model families (GT-opt >= 1.5x baselines, popularity weak).
# Probe scale: 8k sessions / 2k active items (same events-per-item sparsity
# class as reference scale). Each config: GT-opt + GAT + GraphSAGE, dim 64.
set -uo pipefail
cd "$(dirname "$0")/../.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

COMMON="--num-sessions 8000 --num-items 8000 --num-active 2000 --num-clusters 20
        --max-epochs 16 --patience 16 --embedding-dim 64
        --models graph_transformer_optimized gat graphsage"

run() {  # run <name> <extra args...>
  local name=$1; shift
  if [ -f "outputs/sweep_$name/results.json" ]; then
    echo "== $name already done"; return
  fi
  echo "== $name : $*"
  timeout 1800 python scripts/pipeline/corpus_discrimination.py $COMMON \
    --output-dir "outputs/sweep_$name" "$@" \
    > "outputs/logs/sweep_$name.log" 2>&1 || echo "!! $name failed rc=$?"
  python3 - "$name" <<'EOF'
import json, sys
try:
    r = json.load(open(f"outputs/sweep_{sys.argv[1]}/results.json"))
    print("  pop@10:", round(r["baselines"]["popularity_recall@10"], 4))
    for m, v in r["models"].items():
        print(f"  {m}: {v['best_recall@10']:.4f} {v['ci95']} ep{v['best_epoch']}")
except Exception as e:
    print("  no results:", e)
EOF
}

run ctrl
run s4        --successors-per-item 4 --cross-cluster-successors 1
run s4a02     --successors-per-item 4 --cross-cluster-successors 1 --dirichlet-alpha 0.2
run s8a015    --dirichlet-alpha 0.15
run s4a02l12  --successors-per-item 4 --cross-cluster-successors 1 --dirichlet-alpha 0.2 \
              --mean-session-length 12 --noise-prob 0.10
echo "SWEEP DONE"

# Round-2 refinement: s4a02 won on ceiling; probe whether extra distractor
# noise widens the flagship-vs-baseline gap (attention filters distractors)
# without dropping the ceiling below the gate floors.
run s4a02n25  --successors-per-item 4 --cross-cluster-successors 1 --dirichlet-alpha 0.2 \
              --noise-prob 0.25
run s4a02n35  --successors-per-item 4 --cross-cluster-successors 1 --dirichlet-alpha 0.2 \
              --noise-prob 0.35
echo "SWEEP2 DONE"
