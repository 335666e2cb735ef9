#!/usr/bin/env python3
"""A/B deployment analysis (reference scripts/gcp/08 parity).

Reads per-variant request logs (JSONL with fields: variant, latency_ms,
top_score, timestamp — exported from Cloud Logging, or produced locally),
compares latency and score distributions between variants, and runs a
two-sample significance test.
"""

import argparse
import json
from collections import defaultdict
from pathlib import Path

import numpy as np
from scipy import stats


def load_logs(path: str) -> dict[str, dict[str, list[float]]]:
    per_variant: dict[str, dict[str, list[float]]] = defaultdict(
        lambda: {"latency_ms": [], "top_score": []}
    )
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            v = rec.get("variant", "default")
            if "latency_ms" in rec:
                per_variant[v]["latency_ms"].append(float(rec["latency_ms"]))
            if "top_score" in rec:
                per_variant[v]["top_score"].append(float(rec["top_score"]))
    return per_variant


def summarize(values: list[float]) -> dict:
    arr = np.asarray(values)
    return {
        "n": int(arr.size),
        "mean": float(arr.mean()) if arr.size else None,
        "p50": float(np.percentile(arr, 50)) if arr.size else None,
        "p95": float(np.percentile(arr, 95)) if arr.size else None,
    }


def main() -> None:
    parser = argparse.ArgumentParser(description="Analyze A/B request logs")
    parser.add_argument("--logs", type=str, required=True, help="JSONL request log")
    parser.add_argument("--metric", type=str, default="latency_ms",
                        choices=["latency_ms", "top_score"])
    parser.add_argument("--alpha", type=float, default=0.05)
    parser.add_argument("--results-file", type=str, default=None)
    args = parser.parse_args()

    logs = load_logs(args.logs)
    variants = sorted(logs)
    report: dict = {"metric": args.metric, "variants": {v: summarize(logs[v][args.metric]) for v in variants}}

    if len(variants) == 2:
        a, b = (np.asarray(logs[v][args.metric]) for v in variants)
        if len(a) >= 2 and len(b) >= 2:
            t = stats.mannwhitneyu(a, b, alternative="two-sided")
            report["test"] = {
                "kind": "mann-whitney-u",
                "u_statistic": float(t.statistic),
                "p_value": float(t.pvalue),
                "significant": bool(t.pvalue < args.alpha),
                "alpha": args.alpha,
            }

    print(json.dumps(report, indent=2))
    if args.results_file:
        Path(args.results_file).parent.mkdir(parents=True, exist_ok=True)
        with open(args.results_file, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
