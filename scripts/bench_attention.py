"""Time the Pallas fused session-attention kernel vs the XLA attention path.

RESULT (TPU v5e, optimized GT eval forward, B=512) — the kernel LOSES at
every node bucket, so it is NOT wired into the models (negative result,
docs/PERFORMANCE.md "Negative result: fused session attention"):

    | bucket N | XLA forward | fused forward | speedup |
    | 8  | 0.139 ms | 0.447 ms | 0.31x |
    | 16 | 0.191 ms | 0.481 ms | 0.40x |
    | 32 | 0.424 ms | 0.656 ms | 0.65x |
    | 56 | 0.709 ms | 0.897 ms | 0.79x |

Methodology: full eval-config model forward per bucket, chained-state slope
timing with one readback fence (docs/PERFORMANCE.md). The fused variant
swaps the attention core of transformer_conv for the Pallas kernel via a
local conv replica (the production code has no switch — the kernel lost).

Usage: python scripts/bench_attention.py [--buckets 8,16,32,56] [--steps 200]
"""

from __future__ import annotations

import argparse
import functools
import time
from unittest import mock

import numpy as np


def make_batch(bucket_n: int, batch_size: int, num_items: int, seed: int = 0):
    from gat_recommendation_tpu.data.batching import collate, to_device

    rng = np.random.default_rng(seed)
    samples = []
    for _ in range(batch_size):
        n = int(np.clip(rng.geometric(0.25) + 1, 2, bucket_n))
        nodes = np.sort(
            rng.choice(np.arange(1, num_items), size=n, replace=False)
        ).astype(np.int32)
        m = int(rng.integers(n, 6 * n))
        samples.append(
            {
                "nodes": nodes,
                "edge_src": rng.integers(0, n, m).astype(np.int32),
                "edge_dst": rng.integers(0, n, m).astype(np.int32),
                "target": int(rng.integers(1, num_items)),
                "negatives": rng.integers(1, num_items, 5).astype(np.int32),
            }
        )
    return to_device(collate(samples, bucket_n, 5))


def fused_transformer_conv(params, x, adj, *, heads, dropout_rate=0.0, train=False, rng=None):
    """transformer_conv with the attention core swapped for the Pallas kernel."""
    import jax
    import jax.numpy as jnp

    from gat_recommendation_tpu.models.base import linear
    from gat_recommendation_tpu.ops.pallas.session_attention import (
        fused_session_attention,
    )

    q, k, v = (linear(params[n], x) for n in ("query", "key", "value"))
    out = fused_session_attention(q, k, v, adj, heads=heads)
    x_r = linear(params["skip"], x)
    gate_in = jnp.concatenate([out, x_r, out - x_r], axis=-1)
    beta = jax.nn.sigmoid(linear(params["beta"], gate_in))
    return beta * x_r + (1.0 - beta) * out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--buckets", type=str, default="8,16,32,56")
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--num-items", type=int, default=466_865)
    p.add_argument("--steps", type=int, default=200)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gat_recommendation_tpu.models import create_model, graph_transformer

    model = create_model(
        "graph_transformer_optimized",
        num_items=args.num_items,
        embedding_dim=256,
        hidden_dim=256,
    )
    params, state = model.init_params(jax.random.key(0))
    state = {
        **state,
        "cached_pe": jnp.zeros(
            (params["item_embedding"].shape[0], model.config.laplacian_k)
        ),
    }

    print("| bucket N | XLA forward | fused forward | speedup |", flush=True)
    print("|---|---|---|---|", flush=True)
    for bucket in [int(b) for b in args.buckets.split(",")]:
        db = make_batch(bucket, args.batch_size, args.num_items)
        times = {}
        for fused in (False, True):
            patch = (
                mock.patch.object(
                    graph_transformer, "transformer_conv", fused_transformer_conv
                )
                if fused
                else mock.patch.object(
                    graph_transformer,
                    "transformer_conv",
                    graph_transformer.transformer_conv,
                )
            )
            with patch:

                @functools.partial(jax.jit, donate_argnums=0)
                def step(x, db=db):
                    sess, _ = model.apply(
                        params, state, db, model.config, train=False, node_embeddings=x
                    )
                    # feed the output back so consecutive dispatches form a
                    # real dependency chain (identical independent dispatches
                    # pipeline and appear ~25x too fast through the relay)
                    return x + 1e-30 * sess[:, None, :]

                x0 = jnp.asarray(
                    np.random.default_rng(1).normal(
                        size=(args.batch_size, bucket, 256)
                    ),
                    dtype=jnp.float32,
                )

                def run(n, x, step=step):
                    t0 = time.perf_counter()
                    for _ in range(n):
                        x = step(x)
                    jax.block_until_ready(x)
                    return time.perf_counter() - t0, x

                _, x = run(30, x0)  # warmup/compile
                t_short, x = run(20, x)
                t_long, x = run(20 + args.steps, x)
                times[fused] = (t_long - t_short) / args.steps

        print(
            f"| {bucket} | {times[False]*1e3:.3f} ms | {times[True]*1e3:.3f} ms "
            f"| {times[False]/times[True]:.2f}x |",
            flush=True,
        )


if __name__ == "__main__":
    main()
