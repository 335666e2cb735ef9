#!/usr/bin/env python3
"""Export serving artifacts (reference scripts/pipeline/export_onnx.py parity).

The reference exports only the *scoring layer* (L2-normalize + cosine matmul,
export_onnx.py:33-69) to ONNX plus `item_embeddings.npy` + `model_metadata.json`,
validates torch-vs-ONNX and benchmarks. On TPU the serving scorer is a jitted
JAX function, so "export" means:

  * item_embeddings.npy  — the trained table (serving + vertex servers load it)
  * model_metadata.json  — num_items / embedding_dim / provenance
  * scoring validation   — jitted cosine scorer vs a numpy oracle (<1e-5)
  * latency benchmark    — p50/p95 per-request scoring
  * optional true ONNX export of the same scoring layer via torch, gated on
    the `onnx` package (absent in TPU images; the numpy+JAX path is complete
    without it)

Modes: demo (random embeddings), production (from a checkpoint), custom.
"""

import argparse
import json
import time
from pathlib import Path

import numpy as np

from gat_recommendation_tpu.utils.io import save_json
from gat_recommendation_tpu.utils.logging import get_logger


def cosine_scorer_numpy(session_emb: np.ndarray, item_emb: np.ndarray) -> np.ndarray:
    """Oracle: L2-normalize both sides, cosine scores (export_onnx.py:33-69)."""
    s = session_emb / np.maximum(np.linalg.norm(session_emb, axis=-1, keepdims=True), 1e-12)
    e = item_emb / np.maximum(np.linalg.norm(item_emb, axis=-1, keepdims=True), 1e-12)
    return s @ e.T


def make_jax_scorer(item_emb: np.ndarray):
    import jax
    import jax.numpy as jnp

    table = jnp.asarray(item_emb)
    norm_table = table / jnp.maximum(jnp.linalg.norm(table, axis=-1, keepdims=True), 1e-12)

    @jax.jit
    def score(session_emb):
        s = session_emb / jnp.maximum(
            jnp.linalg.norm(session_emb, axis=-1, keepdims=True), 1e-12
        )
        return jnp.dot(s, norm_table.T, preferred_element_type=jnp.float32)

    return score


def export_onnx_scorer(item_emb: np.ndarray, out_path: Path, logger) -> bool:
    """Optional true ONNX export via torch (reference opset-14 dynamic batch)."""
    try:
        import onnx  # noqa: F401
        import torch
    except ImportError:
        logger.warning("onnx/torch unavailable; skipping ONNX file (npy+JAX export is complete)")
        return False

    class SessionRecommender(torch.nn.Module):
        def __init__(self, emb):
            super().__init__()
            self.register_buffer("item_embeddings", torch.nn.functional.normalize(emb, dim=-1))

        def forward(self, session_embedding):
            s = torch.nn.functional.normalize(session_embedding, dim=-1)
            return s @ self.item_embeddings.t()

    model = SessionRecommender(torch.from_numpy(item_emb.copy()))
    dummy = torch.randn(1, item_emb.shape[1])
    torch.onnx.export(
        model, dummy, str(out_path), opset_version=14,
        input_names=["session_embedding"], output_names=["scores"],
        dynamic_axes={"session_embedding": {0: "batch"}, "scores": {0: "batch"}},
    )
    logger.info(f"Wrote ONNX scorer to {out_path}")
    return True


def main() -> None:
    parser = argparse.ArgumentParser(description="Export serving artifacts")
    parser.add_argument("--mode", choices=["demo", "production", "custom"], default="demo")
    parser.add_argument("--checkpoint", type=str, default="outputs/graph_transformer_optimized/checkpoint_best")
    parser.add_argument("--embeddings-file", type=str, default=None, help="custom mode input .npy")
    parser.add_argument("--num-items", type=int, default=10_000, help="demo mode catalog size")
    parser.add_argument("--embedding-dim", type=int, default=256)
    parser.add_argument("--output-dir", type=str, default="exports")
    parser.add_argument("--benchmark-requests", type=int, default=50)
    args = parser.parse_args()
    logger = get_logger(__name__)

    meta: dict = {"mode": args.mode, "exported_at": time.strftime("%Y-%m-%dT%H:%M:%S")}
    if args.mode == "demo":
        rng = np.random.default_rng(42)
        item_emb = rng.standard_normal((args.num_items, args.embedding_dim)).astype(np.float32)
    elif args.mode == "custom":
        item_emb = np.load(args.embeddings_file).astype(np.float32)
        meta["source"] = args.embeddings_file
    else:
        import jax

        from gat_recommendation_tpu.models import create_model
        from gat_recommendation_tpu.train import checkpoint as ckpt

        cmeta = ckpt.load_meta(args.checkpoint)
        cfg = dict(cmeta["model_config"])
        model = create_model(cmeta["model_name"], cfg.pop("num_items"), **cfg)
        p_tmpl, s_tmpl = model.init_params(jax.random.key(0))
        params, _ = ckpt.restore_params_state(args.checkpoint, p_tmpl, s_tmpl)
        item_emb = np.asarray(params["item_embedding"])
        meta.update({"source": args.checkpoint, "model_name": cmeta["model_name"],
                     "epoch": cmeta["epoch"], "best_val_metric": cmeta["best_val_metric"]})

    num_items, embedding_dim = item_emb.shape
    meta.update({"num_items": int(num_items), "embedding_dim": int(embedding_dim)})

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / "item_embeddings.npy", item_emb)
    logger.info(f"Wrote item_embeddings.npy ({item_emb.nbytes / 1e6:.1f} MB)")

    # Validate the jitted scorer vs the numpy oracle (<1e-5, reference parity).
    scorer = make_jax_scorer(item_emb)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((4, embedding_dim)).astype(np.float32)
    got = np.asarray(scorer(q))
    want = cosine_scorer_numpy(q, item_emb)
    max_diff = float(np.abs(got - want).max())
    meta["scorer_validation_max_diff"] = max_diff
    if max_diff > 1e-4:
        raise SystemExit(f"scorer validation failed: max diff {max_diff}")
    logger.info(f"Scorer validated vs numpy oracle (max diff {max_diff:.2e})")

    # Latency benchmark.
    lat = []
    for _ in range(args.benchmark_requests):
        q = rng.standard_normal((1, embedding_dim)).astype(np.float32)
        t0 = time.perf_counter()
        np.asarray(scorer(q))
        lat.append((time.perf_counter() - t0) * 1000)
    meta["scoring_latency_ms"] = {
        "p50": float(np.percentile(lat, 50)),
        "p95": float(np.percentile(lat, 95)),
        "mean": float(np.mean(lat)),
    }
    logger.info(f"Scoring latency p50={meta['scoring_latency_ms']['p50']:.2f}ms")

    meta["onnx_exported"] = export_onnx_scorer(item_emb, out / "session_recommender.onnx", logger)
    save_json(meta, out / "model_metadata.json")
    logger.info(f"Export complete -> {out}")


if __name__ == "__main__":
    main()
