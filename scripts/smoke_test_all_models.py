#!/usr/bin/env python3
"""Smoke-train all 4 models on synthetic batches (reference scripts/smoke_test_all_models.py parity).

2 epochs x 4 synthetic session-graph batches per model, NaN detection,
pass/fail table, exit 1 on any failure. Run in CI.
"""

import sys
import time

import numpy as np

from gat_recommendation_tpu.utils.logging import get_logger

MODELS = ["graphsage", "gat", "graph_transformer", "graph_transformer_optimized"]
NUM_ITEMS = 500


def make_synthetic_batches(num_batches: int = 4, batch_size: int = 8, seed: int = 0):
    from gat_recommendation_tpu.data.batching import collate

    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(num_batches):
        samples = []
        for _ in range(batch_size):
            n = int(rng.integers(3, 8))
            nodes = np.sort(rng.choice(np.arange(1, NUM_ITEMS), n, replace=False)).astype(np.int32)
            m = int(rng.integers(n, 3 * n))
            samples.append(
                {
                    "nodes": nodes,
                    "edge_src": rng.integers(0, n, m).astype(np.int32),
                    "edge_dst": rng.integers(0, n, m).astype(np.int32),
                    "target": int(rng.integers(1, NUM_ITEMS)),
                    "negatives": rng.integers(1, NUM_ITEMS, 5).astype(np.int32),
                }
            )
        batches.append(collate(samples, 8, 5))
    return batches


def smoke_test(name: str, batches) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from gat_recommendation_tpu.data.batching import to_device
    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.train.losses import dual_loss
    from gat_recommendation_tpu.train.trainer import make_train_step

    kwargs: dict = dict(embedding_dim=32, hidden_dim=32)
    if name.startswith("graph_transformer"):
        kwargs["laplacian_k"] = 4
    model = create_model(name, NUM_ITEMS, **kwargs)
    params, state = model.init_params(jax.random.key(0))
    if model.uses_laplacian_pe:
        state = model.precompute_pe(
            state, np.arange(1, 60, dtype=np.int64), np.arange(2, 61, dtype=np.int64)
        )
    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(model, dual_loss, optimizer)

    t0 = time.perf_counter()
    losses = []
    for epoch in range(2):
        for i, hb in enumerate(batches):
            params, state, opt_state, loss = step(
                params, state, opt_state, to_device(hb), jax.random.key(epoch * 100 + i)
            )
            losses.append(float(loss))
    elapsed = time.perf_counter() - t0

    ok = all(np.isfinite(losses))
    return {"pass": ok, "first_loss": losses[0], "last_loss": losses[-1], "seconds": elapsed}


def main() -> None:
    logger = get_logger(__name__)
    batches = make_synthetic_batches()
    results = {}
    for name in MODELS:
        try:
            results[name] = smoke_test(name, batches)
        except Exception as e:
            results[name] = {"pass": False, "error": str(e)}

    logger.info(f"{'model':32s} {'status':8s} {'first':>8s} {'last':>8s} {'time':>6s}")
    failed = False
    for name, r in results.items():
        if r.get("pass"):
            logger.info(
                f"{name:32s} {'PASS':8s} {r['first_loss']:8.4f} {r['last_loss']:8.4f} "
                f"{r['seconds']:5.1f}s"
            )
        else:
            failed = True
            logger.info(f"{name:32s} {'FAIL':8s} {r.get('error', 'NaN loss')}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
