"""Fused AdamW update for the item-embedding table (Pallas TPU kernel).

One pass over HBM: for each row tile, read (w, mu, nu, grad), compute the
full AdamW update (bias-corrected moments + decoupled weight decay, exactly
optax.adamw/torch.AdamW math with eps outside the sqrt), and write (w, mu,
nu) back in place via input/output aliasing. Replaces XLA's ~13 separate
elementwise passes over the 478 MB table (measured 13.6 ms/step -> the fused
step approaches the 6-passes-of-HBM traffic floor).

The padding row (id 0) is preserved by construction: its grad is zeroed by
the caller and a zero row with zero moments stays exactly zero under AdamW.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def adamw_update_reference(
    w: jax.Array,
    mu: jax.Array,
    nu: jax.Array,
    grad: jax.Array,
    count: jax.Array,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
):
    """Pure-jnp AdamW (optax semantics); correctness oracle + non-TPU fallback.

    `count` is the step number AFTER this update (1 on the first call).
    """
    mu = b1 * mu + (1.0 - b1) * grad
    nu = b2 * nu + (1.0 - b2) * jnp.square(grad)
    c = count.astype(jnp.float32)
    mu_hat = mu / (1.0 - jnp.power(b1, c))
    nu_hat = nu / (1.0 - jnp.power(b2, c))
    update = mu_hat / (jnp.sqrt(nu_hat) + eps) + weight_decay * w
    return w - lr * update, mu, nu


def _kernel(count_ref, w_ref, mu_ref, nu_ref, g_ref, w_out, mu_out, nu_out,
            *, lr, b1, b2, eps, weight_decay, sr_mu, sr_nu):
    import math

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = g_ref[...]
    # Compute in f32 regardless of the moment STORAGE dtype (bf16 moments
    # halve HBM traffic; arithmetic in bf16 would compound the storage
    # error every step).
    mu = b1 * mu_ref[...].astype(jnp.float32) + (1.0 - b1) * g
    nu = b2 * nu_ref[...].astype(jnp.float32) + (1.0 - b2) * g * g
    c = count_ref[0].astype(jnp.float32)
    # b^c as exp(c*log(b)): Mosaic has no powf with a runtime exponent.
    mu_hat = mu / (1.0 - jnp.exp(c * math.log(b1)))
    nu_hat = nu / (1.0 - jnp.exp(c * math.log(b2)))
    w = w_ref[...]
    update = mu_hat / (jnp.sqrt(nu_hat) + eps) + weight_decay * w
    w_out[...] = w - lr * update
    if sr_mu or sr_nu:
        # Unbiased bf16 store (same trick as sparse_adamw._sr_bf16; RNE
        # stalls nu's sub-ulp increments — docs/EXPERIMENTS.md). Seed =
        # (step count, tile) so rounding is reproducible per step.
        from gat_recommendation_tpu.ops.pallas.sparse_adamw import _sr_bf16

        pltpu.prng_seed(
            count_ref[0] + pl.program_id(0) * jnp.int32(-1640531535)
        )
    if sr_mu:
        mu_out[...] = _sr_bf16(mu, pltpu.prng_random_bits(mu.shape))
    else:
        mu_out[...] = mu.astype(mu_out.dtype)
    if sr_nu:
        nu_out[...] = _sr_bf16(nu, pltpu.prng_random_bits(nu.shape))
    else:
        nu_out[...] = nu.astype(nu_out.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("lr", "b1", "b2", "eps", "weight_decay", "row_tile", "interpret"),
)
def fused_embedding_adamw(
    w: jax.Array,
    mu: jax.Array,
    nu: jax.Array,
    grad: jax.Array,
    count: jax.Array,
    *,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    row_tile: int = 512,
    stochastic_rounding: bool = False,
    interpret: bool = False,
):
    """Single-pass fused AdamW over the [V, D] table. Returns (w', mu', nu').

    `count` is the post-update step number (int32 scalar array).
    stochastic_rounding: unbiased store for bf16 mu/nu (per-buffer).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, D = w.shape
    grid = (pl.cdiv(V, row_tile),)

    def idx(i, *_prefetch):
        return (i, 0)

    spec = pl.BlockSpec((row_tile, D), idx, memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel, lr=lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
        sr_mu=stochastic_rounding and mu.dtype == jnp.bfloat16,
        sr_nu=stochastic_rounding and nu.dtype == jnp.bfloat16,
    )
    count_arr = jnp.asarray(count, jnp.int32).reshape((1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
    )
    # No input/output aliasing on purpose: aliasing non-donated jit inputs
    # makes XLA insert defensive copies of w/mu/nu (2.8 GB extra traffic,
    # measured 8.1 ms vs ~4.5 ms), and donation trips an execution-relay
    # deadlock in this environment. Fresh outputs have the same HBM traffic
    # (4 reads + 3 writes) at the cost of transient allocation only.
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((V, D), w.dtype),
            jax.ShapeDtypeStruct((V, D), mu.dtype),
            jax.ShapeDtypeStruct((V, D), nu.dtype),
        ],
        interpret=interpret,
    )(count_arr, w, mu, nu, grad)
