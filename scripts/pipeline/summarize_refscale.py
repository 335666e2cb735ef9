#!/usr/bin/env python3
"""Summarize a reference-scale study directory into the EXPERIMENTS.md table.

Reads ``<study>/<model>/history.json`` (val trajectories, written by the
Trainer), ``<study>/evaluation_results.json`` (test-split numbers from
scripts/evaluate_local.py) and ``<study>/quality_gate_results.json``, and
prints (a) a GitHub-markdown table with every cell filled — the reference's
EXPERIMENTS table shape (/root/reference/docs/EXPERIMENTS.md:36-41) — and
(b) the model ordering by best validation recall@10, which is the claim the
study exists to check (GT-opt > GAT > GraphSAGE in the reference).

Usage:
    python scripts/pipeline/summarize_refscale.py outputs/refscale_structured
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from gat_recommendation_tpu.train.hits_io import load_best_hits  # noqa: E402

DISPLAY = {
    "graph_transformer_optimized": "GT optimized",
    "graph_transformer": "GT (+FFN)",
    "gat": "GAT",
    "graphsage": "GraphSAGE",
}


def load_model_rows(study: Path) -> dict[str, dict]:
    eval_results = {}
    eval_file = study / "evaluation_results.json"
    if eval_file.exists():
        eval_results = json.loads(eval_file.read_text())
        eval_results = eval_results.get("models", eval_results)

    rows: dict[str, dict] = {}
    for hist_file in sorted(study.glob("*/history.json")):
        name = hist_file.parent.name
        hist = json.loads(hist_file.read_text())
        vals = hist.get("val_metrics", [])
        if not vals:
            continue
        r10 = [m["recall@10"] for m in vals]
        best = max(range(len(r10)), key=r10.__getitem__)
        test = eval_results.get(name, {})
        if isinstance(test, dict) and "metrics" in test:
            test = test["metrics"]
        rows[name] = {
            "best_val_r10": r10[best],
            "best_val_n10": vals[best].get("ndcg@10"),
            "best_val_r20": vals[best].get("recall@20"),
            "best_epoch": best,
            "epochs_run": len(r10),
            "test_r10": test.get("recall@10"),
            "test_n10": test.get("ndcg@10"),
            "test_r20": test.get("recall@20"),
        }
    return rows


def fmt(x) -> str:
    return f"{x:.4f}" if isinstance(x, (int, float)) else "—"


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("study_dir", type=Path)
    args = p.parse_args()
    rows = load_model_rows(args.study_dir)
    if not rows:
        sys.exit(f"no */history.json under {args.study_dir}")

    order = sorted(rows, key=lambda k: -rows[k]["best_val_r10"])
    print("| Model | best val r@10 | val n@10 | val r@20 | test r@10 | test n@10 | test r@20 | epochs (best) |")
    print("|---|---|---|---|---|---|---|---|")
    for name in order:
        r = rows[name]
        print(
            f"| {DISPLAY.get(name, name)} | {fmt(r['best_val_r10'])} | {fmt(r['best_val_n10'])} "
            f"| {fmt(r['best_val_r20'])} | {fmt(r['test_r10'])} | {fmt(r['test_n10'])} "
            f"| {fmt(r['test_r20'])} | {r['epochs_run']} ({r['best_epoch']}) |"
        )

    print("\nordering by best val recall@10: " + " > ".join(DISPLAY.get(n, n) for n in order))

    # Paired bootstrap CIs on adjacent ordering margins, when the runs
    # recorded per-session hit vectors (train_baseline.py --record-hits).
    # An ordering edge is only claimed settled when the 95% CI excludes 0.
    hits = {}
    for name in order:
        hv = load_best_hits(args.study_dir / name, rows[name]["best_epoch"], k=10)
        if hv is not None:
            hits[name] = np.asarray(hv, dtype=np.float64)
    if len(hits) >= 2:
        rng = np.random.default_rng(0)
        print("\nadjacent ordering margins (paired bootstrap, 95% CI):")
        present = [n for n in order if n in hits]
        for a, b in zip(present, present[1:]):
            if len(hits[a]) != len(hits[b]):
                print(f"  {a} - {b}: hit vectors differ in length, skipped")
                continue
            diff = hits[a] - hits[b]
            # Chunked resampling: a one-shot (2000, n) int64 index matrix is
            # multi-GB at reference-scale val counts (ADVICE r4); 100-resample
            # chunks with the same RNG stream give identical margins.
            margins = np.concatenate([
                diff[rng.integers(0, len(diff), size=(chunk, len(diff)))].mean(axis=1)
                for chunk in [100] * 20
            ])
            lo, hi = np.quantile(margins, [0.025, 0.975])
            tag = "SETTLED" if lo > 0 or hi < 0 else "UNRESOLVED (CI contains 0)"
            print(
                f"  {DISPLAY.get(a, a)} - {DISPLAY.get(b, b)}: "
                f"{diff.mean():+.4f} [{lo:+.4f}, {hi:+.4f}] {tag}"
            )

    gate = args.study_dir / "quality_gate_results.json"
    if gate.exists():
        g = json.loads(gate.read_text())
        print(f"quality gate: {'PASS' if g.get('pass') else 'FAIL'} ({gate})")


if __name__ == "__main__":
    main()
