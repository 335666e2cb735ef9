#!/usr/bin/env python3
"""CI/CD deploy quality gate (reference scripts/pipeline/model_quality_gate.py parity).

Three phases, exit 0/1:
  1. artifact: checkpoint exists, size within bounds, loads, NaN scan of
     every array (reference :82-117);
  2. metrics: evaluate on the test split, compare against thresholds from
     configs/quality_thresholds.yaml with CLI overrides (reference :185-309);
  3. latency: timed per-request forwards through the serving Recommender,
     p50/p95/p99 vs SLO (reference :120-182).
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

from gat_recommendation_tpu.utils.io import load_config, save_json
from gat_recommendation_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def load_thresholds(path: str, overrides: dict) -> dict:
    th = load_config(path)
    for key, val in overrides.items():
        if val is not None:
            th["metrics"][key] = val
    return th


def dir_size_mb(path: Path) -> float:
    return sum(f.stat().st_size for f in path.rglob("*") if f.is_file()) / 1e6


def validate_artifact(ckpt_dir: Path, th: dict) -> tuple[bool, dict]:
    """Phase 1: exists / size bounds / loads / NaN scan of every tensor."""
    result: dict = {"phase": "artifact"}
    if not (ckpt_dir / "meta.json").exists():
        result["error"] = f"checkpoint not found at {ckpt_dir}"
        return False, result

    size = dir_size_mb(ckpt_dir)
    result["size_mb"] = size
    if not (th["artifact"]["min_size_mb"] <= size <= th["artifact"]["max_size_mb"]):
        result["error"] = f"size {size:.1f}MB outside bounds"
        return False, result

    import jax

    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.train import checkpoint as ckpt

    try:
        meta = ckpt.load_meta(ckpt_dir)
        cfg = dict(meta["model_config"])
        model = create_model(meta["model_name"], cfg.pop("num_items"), **cfg)
        p_tmpl, s_tmpl = model.init_params(jax.random.key(0))
        params, state = ckpt.restore_params_state(ckpt_dir, p_tmpl, s_tmpl)
    except Exception as e:
        result["error"] = f"checkpoint failed to load: {e}"
        return False, result

    # NaN scan on device: per-leaf finite flags reduced in ONE jitted call,
    # a single small readback — np.asarray per leaf would haul the whole
    # 478 MB table back through the remote-TPU relay.
    import jax.numpy as jnp

    leaves = jax.tree.leaves((params, state))
    flags = np.asarray(
        jax.jit(lambda ls: jnp.array([jnp.isfinite(leaf).all() for leaf in ls]))(leaves)
    )
    result["nan_arrays"] = int((~flags).sum())
    if result["nan_arrays"]:
        result["error"] = f"{result['nan_arrays']} arrays contain NaN/Inf"
        return False, result
    result["model_name"] = meta["model_name"]
    return True, result


def validate_metrics(ckpt_dir: Path, test_sessions: str, graph_edges: str, th: dict,
                     batch_size: int) -> tuple[bool, dict]:
    """Phase 2: recall/ndcg on the test split vs thresholds."""
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from evaluate_local import evaluate_checkpoint  # noqa: E402

    import json

    from gat_recommendation_tpu.data.batching import SessionDataset
    from gat_recommendation_tpu.data.graph import load_edges

    split_info = json.loads((Path(test_sessions).parent / "split_info.json").read_text())
    test_ds = SessionDataset(test_sessions, load_edges(graph_edges),
                             num_items=split_info["num_items"])
    metrics = evaluate_checkpoint(Path(ckpt_dir), test_ds, batch_size, [10, 20])

    result = {"phase": "metrics", **metrics, "thresholds": th["metrics"], "failures": []}
    for name, floor in th["metrics"].items():
        if metrics.get(name, 0.0) < floor:
            result["failures"].append(f"{name}={metrics.get(name, 0):.4f} < {floor}")
    return not result["failures"], result


def validate_latency(ckpt_dir: Path, graph_edges: str, th: dict, n_requests: int) -> tuple[bool, dict]:
    """Phase 3: per-request serving latency p50/p95/p99 vs SLO."""
    from gat_recommendation_tpu.serving.recommender import Recommender
    from gat_recommendation_tpu.serving.validation import ValidatedRequest

    rec = Recommender(ckpt_dir, graph_edges, warmup=True)
    rng = np.random.default_rng(0)
    lat = []
    for _ in range(n_requests):
        items = rng.integers(1, rec.num_items, int(rng.integers(2, 10))).tolist()
        t0 = time.perf_counter()
        rec.recommend(ValidatedRequest(session_items=items, k=10))
        lat.append((time.perf_counter() - t0) * 1000)

    slo = th["latency_slo_ms"]
    result = {
        "phase": "latency",
        "p50": float(np.percentile(lat, 50)),
        "p95": float(np.percentile(lat, 95)),
        "p99": float(np.percentile(lat, 99)),
        "slo": slo,
        "failures": [],
    }
    for pct in ("p50", "p95", "p99"):
        if result[pct] > slo[pct]:
            result["failures"].append(f"{pct}={result[pct]:.1f}ms > {slo[pct]}ms")
    return not result["failures"], result


def main() -> None:
    parser = argparse.ArgumentParser(description="Model quality gate")
    parser.add_argument("--checkpoint", type=str,
                        default="outputs/graph_transformer_optimized/checkpoint_best")
    parser.add_argument("--test-sessions", type=str, default="data/processed/test.csv")
    parser.add_argument("--graph-edges", type=str, default="data/processed/graph_edges.csv")
    parser.add_argument("--thresholds", type=str, default="configs/quality_thresholds.yaml")
    parser.add_argument("--min-recall-10", type=float, default=None)
    parser.add_argument("--min-recall-20", type=float, default=None)
    parser.add_argument("--min-ndcg-10", type=float, default=None)
    parser.add_argument("--min-ndcg-20", type=float, default=None)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--latency-requests", type=int, default=50)
    parser.add_argument("--skip-latency", action="store_true")
    parser.add_argument("--skip-metrics", action="store_true")
    parser.add_argument("--results-file", type=str, default="outputs/quality_gate_results.json")
    args = parser.parse_args()

    th = load_thresholds(args.thresholds, {
        "recall@10": args.min_recall_10, "recall@20": args.min_recall_20,
        "ndcg@10": args.min_ndcg_10, "ndcg@20": args.min_ndcg_20,
    })

    results: dict = {"checkpoint": args.checkpoint, "phases": {}}
    ok, res = validate_artifact(Path(args.checkpoint), th)
    results["phases"]["artifact"] = res
    logger.info(f"Phase 1 artifact: {'PASS' if ok else 'FAIL'} {res.get('error', '')}")
    all_ok = ok

    if ok and not args.skip_metrics:
        mok, res = validate_metrics(Path(args.checkpoint), args.test_sessions,
                                    args.graph_edges, th, args.batch_size)
        results["phases"]["metrics"] = res
        logger.info(f"Phase 2 metrics: {'PASS' if mok else 'FAIL'} {res.get('failures', '')}")
        all_ok &= mok

    if ok and not args.skip_latency:
        lok, res = validate_latency(Path(args.checkpoint), args.graph_edges, th,
                                    args.latency_requests)
        results["phases"]["latency"] = res
        logger.info(f"Phase 3 latency: {'PASS' if lok else 'FAIL'} "
                    f"p50={res['p50']:.1f}ms {res.get('failures', '')}")
        all_ok &= lok

    results["pass"] = bool(all_ok)
    save_json(results, args.results_file)
    logger.info(f"Quality gate {'PASSED' if all_ok else 'FAILED'} -> {args.results_file}")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
