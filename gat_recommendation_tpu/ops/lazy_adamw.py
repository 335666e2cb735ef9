"""Lazy catch-up AdamW math for the embedding table: O(touched rows)/step.

The eager sparse update (train/optimizers.FusedEmbeddingAdamW.update_sparse)
still sweeps the FULL [V, D] table + both moment buffers every step (~2.9 GB
of HBM traffic at the reference table) because dense AdamW updates every row
every step: untouched rows (zero gradient) decay their moments (mu *= b1,
nu *= b2), decay their weight ((1 - lr*wd)), and keep absorbing the momentum
tail (-lr * mu_hat / (sqrt(nu_hat) + eps)). All three effects are
DETERMINISTIC functions of (row values at last touch, number of skipped
steps) — so they can be applied lazily, at the next touch, and the per-step
work drops to O(U·D) gather/compute/scatter over the ~7k touched rows.

Exactness: moment decay and weight decay have closed forms (b^m and
(1-lr*wd)^m). The momentum tail is the series

    w_m = a^m w_0 - lr * sum_{j=1..m} a^(m-j) * u_j,    a = 1 - lr*wd
    u_j = (b1^j mu_0 / (1-b1^(s0+j))) /
          (sqrt(b2^j nu_0 / (1-b2^(s0+j))) + eps)

whose terms shrink like (b1/sqrt(b2))^j ≈ 0.9^j; truncating at J=64 terms
leaves < b1^65/(1-b1) ≈ 1.1e-2 of one update unit ≈ 1e-5 absolute weight
error (tests/test_lazy_adamw.py measures it). The J-term sum is a Python
loop inside jit — XLA fuses the unrolled elementwise chain into a single
pass over the [U, D] operands, so it costs FLOPs (cheap on the VPU), not
HBM traffic.

Numerics: a = 1 - lr*wd is 1 - 1e-8 at the reference hyperparameters —
unrepresentable in f32 — so all decay powers are computed in log space
(exp(m * log1p(-lr*wd))). Bias-correction powers b^(s0+j) underflow to 0
for old rows, giving the correct asymptotic correction of 1.

Reference semantics anchor: torch.optim.AdamW over the nn.Embedding weight
(/root/reference/etpgt/train/trainer.py) updates every row every step; this
module reproduces that trajectory to ~1e-5 instead of approximating it away
(unlike torch.optim.SparseAdam, which silently drops decay and tail for
untouched rows).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# Momentum-tail series length. b1^64 = 1.2e-3: the truncated remainder is
# ~1e-2 of one update unit, i.e. ~1e-5 absolute on weights at lr 1e-3.
TAIL_TERMS = 64


def catch_up(
    w,
    mu,
    nu,
    last_step,
    m,
    *,
    lr: float,
    b1: float,
    b2: float,
    eps: float,
    weight_decay: float,
    tail_terms: int = TAIL_TERMS,
):
    """Apply m zero-gradient AdamW steps to rows last touched at `last_step`.

    w, mu, nu: [U, D] f32 row values as stored at step `last_step`.
    last_step: [U] int32 — global step index of each row's last touch.
    m:         [U] int32 >= 0 — number of skipped steps to apply (the steps
               at global indices last_step+1 .. last_step+m).

    Returns (w_c, mu_c, nu_c): the values dense AdamW would hold after step
    last_step+m, to within the tail truncation above.
    """
    assert 0.0 < b1 < 1.0 and 0.0 < b2 < 1.0, "closed forms need 0 < b < 1"
    mf = m.astype(jnp.float32)[:, None]  # [U, 1]
    sf = last_step.astype(jnp.float32)[:, None]
    ln_b1, ln_b2 = math.log(b1), math.log(b2)
    a_log = math.log1p(-lr * weight_decay)  # exact where (1-lr*wd) is not

    sqnu = jnp.sqrt(nu)
    acc = jnp.zeros_like(w)
    for j in range(1, tail_terms + 1):
        s = sf + j  # global index of the j-th skipped step
        bc1 = 1.0 - jnp.exp(s * ln_b1)  # underflows to exactly 1 for old rows
        bc2 = 1.0 - jnp.exp(s * ln_b2)
        u = ((b1**j) / bc1) * mu / (jnp.sqrt((b2**j) / bc2) * sqnu + eps)
        # a^(m-j) gate: rows with m < j contribute nothing for this term.
        fac = jnp.where(mf >= j, jnp.exp(jnp.maximum(mf - j, 0.0) * a_log), 0.0)
        acc = acc + fac * u
    w_c = jnp.exp(mf * a_log) * w - lr * acc
    mu_c = jnp.exp(mf * ln_b1) * mu
    nu_c = jnp.exp(mf * ln_b2) * nu
    return w_c, mu_c, nu_c


def touched_update(
    w_c,
    mu_c,
    nu_c,
    g,
    count,
    *,
    lr: float,
    b1: float,
    b2: float,
    eps: float,
    weight_decay: float,
):
    """One standard AdamW step at global step `count` on caught-up rows.

    Identical math to the eager paths (optimizers.update_sparse /
    ops/pallas/sparse_adamw.py): bias correction by `count`, decoupled
    weight decay on the pre-update weight.
    """
    mu = b1 * mu_c + (1.0 - b1) * g
    nu = b2 * nu_c + (1.0 - b2) * jnp.square(g)
    c = count.astype(jnp.float32)
    mu_hat = mu / (1.0 - jnp.power(b1, c))
    nu_hat = nu / (1.0 - jnp.power(b2, c))
    w = w_c - lr * (mu_hat / (jnp.sqrt(nu_hat) + eps) + weight_decay * w_c)
    return w, mu, nu


def materialize_arrays(
    table,
    mu,
    nu,
    last_step,
    count,
    *,
    lr: float,
    b1: float,
    b2: float,
    eps: float,
    weight_decay: float,
    tail_terms: int = TAIL_TERMS,
):
    """Catch every row up to step `count` (no new gradient) — one dense pass.

    Used before eval / checkpoint / snapshot so the stored table equals what
    dense AdamW would hold at `count`. Returns (table, mu, nu, last_step)
    with last_step == count everywhere. Idempotent (m = 0 is a no-op).
    """
    m = jnp.maximum(count - last_step, 0)
    w_c, mu_c, nu_c = catch_up(
        table,
        mu.astype(jnp.float32),
        nu.astype(jnp.float32),
        last_step,
        m,
        lr=lr,
        b1=b1,
        b2=b2,
        eps=eps,
        weight_decay=weight_decay,
        tail_terms=tail_terms,
    )
    new_last = jnp.full_like(last_step, count)
    return w_c, mu_c, nu_c, new_last


def dense_reference_step(w, mu, nu, g, count, *, lr, b1, b2, eps, weight_decay):
    """Plain dense AdamW step over the whole array — the oracle the lazy
    path is tested against (tests/test_lazy_adamw.py). Same math as
    ops/pallas/embedding_adamw.adamw_update_reference, kept here so the
    tests state their ground truth next to the thing under test."""
    mu = b1 * mu + (1.0 - b1) * g
    nu = b2 * nu + (1.0 - b2) * jnp.square(g)
    c = jnp.asarray(count, jnp.float32)
    mu_hat = mu / (1.0 - jnp.power(b1, c))
    nu_hat = nu / (1.0 - jnp.power(b2, c))
    w = w - lr * (mu_hat / (jnp.sqrt(nu_hat) + eps) + weight_decay * w)
    return w, mu, nu
