#!/usr/bin/env python3
"""Reference-scale serving latency bench on a CPU host.

Measures the real per-request path (induced subgraph -> jitted GNN forward
-> full-catalog scoring with seen-item masking -> top-k) against a
reference-scale checkpoint, on the CPU backend — the deployment target the
reference measured its serving numbers on (reference docs/DEPLOYMENT.md:
51.7 ms PyTorch full model, 5.5 ms ONNX mean-embedding approximation, both
at the 466k catalog). Reports both scoring modes:

  exact  — jitted f32 GEMV over the whole table + lax.top_k
  int8   — native int8 candidate scan (native/scorer.cpp) + exact f32
           re-rank of the top-1024 candidates (real GNN either way)

Run with the CPU env so the TPU relay is never dialed:
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/serve/latency_bench.py \
        --checkpoint outputs/refscale_structured/graph_transformer_optimized/checkpoint_best \
        --graph-edges data_refscale/processed/graph_edges.npz
"""

import argparse
import json
import time
from pathlib import Path

import numpy as np


def measure(rec, reqs) -> dict:
    lat = []
    for r in reqs:
        t0 = time.perf_counter()
        rec.recommend(r)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.array(lat)
    return {
        "p50": round(float(np.percentile(lat, 50)), 2),
        "p95": round(float(np.percentile(lat, 95)), 2),
        "p99": round(float(np.percentile(lat, 99)), 2),
        "n": len(lat),
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--graph-edges", required=True)
    p.add_argument("--num-requests", type=int, default=200)
    p.add_argument("--results-file", type=str, default=None)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gat_recommendation_tpu.serving.recommender import Recommender
    from gat_recommendation_tpu.serving.validation import ValidatedRequest
    from gat_recommendation_tpu.utils.logging import get_logger

    logger = get_logger(__name__)
    results: dict = {"backend": "cpu"}
    rng = np.random.default_rng(0)

    for mode, flag in (("exact", False), ("int8", "auto")):
        t0 = time.time()
        rec = Recommender(args.checkpoint, args.graph_edges, warmup=True, int8_scoring=flag)
        load_s = round(time.time() - t0, 1)
        if mode == "int8" and not rec.int8_scoring:
            logger.warning("int8 scoring unavailable (native lib or catalog size)")
            continue
        reqs = [
            ValidatedRequest(
                session_items=[int(x) for x in rng.integers(1, rec.num_items, rng.integers(2, 12))],
                k=10,
            )
            for _ in range(args.num_requests)
        ]
        results[mode] = {**measure(rec, reqs), "load_warmup_s": load_s}
        logger.info(f"{mode}: {results[mode]}")
        del rec

    if args.results_file:
        Path(args.results_file).parent.mkdir(parents=True, exist_ok=True)
        Path(args.results_file).write_text(json.dumps(results, indent=2))
        logger.info(f"wrote {args.results_file}")


if __name__ == "__main__":
    main()
