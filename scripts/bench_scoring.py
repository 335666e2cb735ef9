"""Time full-catalog top-k selector variants at the eval configuration.

Measures (TPU v5e, B=512, V=466,944 padded / num_items=466,865, D=256, k=20)
the selectors in ops/scoring.py plus a tail-masked two-level candidate, to
locate the exact-selector floor (VERDICT r1 #10). The scoring matmul writes
[B, V] f32 (~956 MB) and every exact selector must read it back at least
once, so the traffic floor is ~2.4 ms + 0.3 ms MXU; the question is how much
each variant pays on top.

Methodology: dependency-chained dispatches (each step's input is perturbed
by the previous top-k scores so the relay cannot pipeline identical
dispatches), block_until_ready fence, slope over (long - short) windows —
see docs/PERFORMANCE.md "Methodology".

Usage: python scripts/bench_scoring.py [--steps 100] [--k 20]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--num-items", type=int, default=466_865)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--steps", type=int, default=100)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gat_recommendation_tpu.models.base import TABLE_PAD_MULTIPLE
    from gat_recommendation_tpu.ops import scoring

    V = -(-args.num_items // TABLE_PAD_MULTIPLE) * TABLE_PAD_MULTIPLE
    B, D, k, num_items = args.batch_size, 256, args.k, args.num_items
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    se0 = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    def matmul_only(se, emb, k, num_items):
        s = jnp.dot(se, emb.T, preferred_element_type=jnp.float32)
        return s.max(axis=-1, keepdims=True), None  # forces full compute

    variants = {
        "matmul_only": matmul_only,
        "dense": scoring.dense_topk,
        "two_level": scoring.two_level_topk,
        "two_level_nomask": lambda se, emb, k, num_items: scoring.two_level_topk(
            se, emb, k, None
        ),
        "approx": scoring.approx_topk,
    }
    for chunk in (16, 64):
        variants[f"two_level_c{chunk}"] = functools.partial(
            scoring.two_level_topk, chunk=chunk
        )

    results = {}
    for name, fn in variants.items():

        @jax.jit
        def step(se, fn=fn):
            s, _ = fn(se, emb, k, num_items)
            # feed scores back: dependency chain defeats relay pipelining
            return se * (1.0 + 1e-30 * s[:, :1])

        se = step(se0)  # compile
        jax.block_until_ready(se)

        def run(n, se):
            t0 = time.perf_counter()
            for _ in range(n):
                se = step(se)
            jax.block_until_ready(se)
            return time.perf_counter() - t0, se

        t_short, se = run(args.steps // 5, se)
        t_long, se = run(args.steps // 5 + args.steps, se)
        ms = (t_long - t_short) / args.steps * 1e3
        results[name] = ms
        print(f"{name:20s} {ms:7.3f} ms", flush=True)

    print()
    print(f"exact floor estimate: matmul+1 read ~= "
          f"{results['matmul_only'] + B * V * 4 / 819e9 * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
