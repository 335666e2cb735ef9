"""Stochastic rounding f32 -> bf16 (the XLA-side implementation).

Why: bf16 moment storage halves the optimizer's HBM traffic but collapses
training quality under round-to-nearest-even — the second moment's per-step
increment is (1-b2)=0.1% of its running value, far below a bf16 ulp
(2^-8 relative), so increments round to zero and the moment stalls
(measured: -17.4 points val recall@10 at reference scale,
docs/EXPERIMENTS.md "bf16 optimizer-moments study"). Stochastic rounding
makes the stored value an unbiased estimator — tiny increments survive in
expectation — which is the standard recipe for low-precision optimizer
state on TPUs.

Mechanics: bf16 is the top 16 bits of the f32 pattern. Add a uniform
16-bit integer to the f32 bits, truncate the low 16 — the carry promotes
to the next representable bf16 with probability equal to the discarded
fraction. Exactly-representable values (low bits zero) never change; sign
handling is free (two's-complement carry never crosses the sign bit for
finite moments). The Pallas twin lives in ops/pallas/sparse_adamw.py
(same trick, in-kernel pltpu.prng bits — zero extra HBM traffic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOW16 = jnp.uint32(0x0000FFFF)
_HIGH16 = jnp.uint32(0xFFFF0000)


def stochastic_round_bf16(x: jax.Array, key: jax.Array) -> jax.Array:
    """Round f32 `x` to bf16 stochastically (unbiased). Returns bf16."""
    assert x.dtype == jnp.float32, x.dtype
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    r = jax.random.bits(key, x.shape, jnp.uint32) & _LOW16
    rounded = (bits + r) & _HIGH16
    out = jax.lax.bitcast_convert_type(rounded, jnp.float32)
    return out.astype(jnp.bfloat16)
