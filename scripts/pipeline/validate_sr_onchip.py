#!/usr/bin/env python3
"""On-chip validation of in-kernel stochastic rounding (sparse AdamW).

The TPU interpreter's pltpu.prng_random_bits returns zeros, so CI can only
check SR's degenerate behavior; the real bit stream must be validated on
hardware. This script checks, on the real chip:

1. different step counts give different rounding patterns; same count is
   bit-reproducible (resume determinism);
2. SR outputs are one of the two adjacent bf16 neighbours of the exact
   f32 moment;
3. unbiasedness: averaging the SR'd second moment over many steps tracks
   the exact f32 accumulator, while RNE visibly stalls (the mechanism
   behind the r4 bf16 quality collapse).

Run (chip must be idle — one TPU process at a time):
    python scripts/pipeline/validate_sr_onchip.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from gat_recommendation_tpu.data.batching import UID_SENTINEL
from gat_recommendation_tpu.ops.pallas.sparse_adamw import TILE, fused_sparse_adamw

HP = dict(lr=0.0, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0)


def main() -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    rows, dim = 2 * TILE, 256
    rng = np.random.default_rng(0)
    table = jnp.zeros((rows, dim), jnp.float32)
    nu0 = np.abs(rng.normal(size=(rows, dim))).astype(np.float32) * 1e-2
    mu0 = rng.normal(size=(rows, dim)).astype(np.float32) * 1e-2
    uid = jnp.full((64,), UID_SENTINEL, jnp.int32)  # no touched rows: pure decay+SR
    summed = jnp.zeros((64, dim), jnp.float32)

    def step(mu, nu, count):
        return fused_sparse_adamw(
            table, mu, nu, uid, summed, count, **HP, stochastic_rounding=True
        )

    mu_b = jnp.asarray(mu0).astype(jnp.bfloat16)
    nu_b = jnp.asarray(nu0).astype(jnp.bfloat16)

    # 1. determinism / stream separation
    _, m5a, n5a = step(mu_b, nu_b, 5)
    _, m5b, n5b = step(mu_b, nu_b, 5)
    _, m6, n6 = step(mu_b, nu_b, 6)
    assert (np.asarray(n5a) == np.asarray(n5b)).all(), "same count must be bit-equal"
    frac_diff = (np.asarray(n5a) != np.asarray(n6)).mean()
    assert frac_diff > 0.05, f"different count should re-round; diff frac {frac_diff}"
    print(f"1. determinism OK (count-5 reproducible; count-6 differs on "
          f"{frac_diff:.1%} of elements)")

    # 2. adjacency: SR(b*nu) is one of the two bf16 neighbours
    exact = (HP["b2"] * np.asarray(nu_b, np.float32)).astype(np.float32)
    bits = exact.view(np.uint32)
    lo = (bits & np.uint32(0xFFFF0000)).view(np.float32)
    hi = ((bits & np.uint32(0xFFFF0000)) + np.uint32(0x10000)).view(np.float32)
    got = np.asarray(n5a, np.float32)
    ok = (got == lo) | (got == hi)
    assert ok.all(), f"non-adjacent SR outputs: {(~ok).sum()}"
    took_hi = float((got == hi)[lo != hi].mean())
    print(f"2. adjacency OK (upper neighbour taken on {took_hi:.1%})")

    # 3. unbiasedness under accumulation: nu <- b2*nu + (1-b2)*1 via real
    # updates on ONE touched row, 2000 steps, vs f32 exact and bf16 RNE.
    # The whole loop runs in ONE dispatch (fori_loop over the kernel) —
    # per-step dispatches through the remote relay would take ~an hour.
    uid1 = jnp.full((64,), UID_SENTINEL, jnp.int32).at[0].set(TILE + 3)
    g = jnp.zeros((64, dim), jnp.float32).at[0].set(1.0)  # g^2 = 1
    b2 = HP["b2"]

    @jax.jit
    def run_sr(mu, nu):
        def body(t, carry):
            mu, nu = carry
            _, mu, nu = fused_sparse_adamw(
                table, mu, nu, uid1, g, t, **HP, stochastic_rounding=True
            )
            return (mu, nu)

        return jax.lax.fori_loop(1, 2001, body, (mu, nu))

    _, nu_sr = run_sr(
        jnp.zeros((rows, dim), jnp.bfloat16), jnp.zeros((rows, dim), jnp.bfloat16)
    )
    import ml_dtypes

    exact_acc, nu_rne = 0.0, np.zeros(dim, np.float32)
    for _ in range(2000):
        exact_acc = b2 * exact_acc + (1 - b2)
        nu_rne = (b2 * nu_rne + (1 - b2)).astype(ml_dtypes.bfloat16).astype(np.float32)
    sr_val = float(np.asarray(nu_sr, np.float32)[TILE + 3].mean())
    rne_val = float(nu_rne.mean())
    print(f"3. after 2000 steps: exact {exact_acc:.4f}  SR {sr_val:.4f}  "
          f"RNE {rne_val:.4f}")
    assert abs(sr_val - exact_acc) < 0.05 * exact_acc, "SR should track exact"
    assert rne_val < 0.7 * exact_acc, "RNE should stall (the r4 collapse mechanism)"
    print("ALL ON-CHIP SR CHECKS PASSED")


if __name__ == "__main__":
    main()
