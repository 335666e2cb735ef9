"""Fused session-attention Pallas kernel vs the XLA einsum path (interpret mode)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gat_recommendation_tpu.models.layers import init_transformer_conv, transformer_conv
from gat_recommendation_tpu.ops.masked import masked_softmax
from gat_recommendation_tpu.ops.pallas.session_attention import fused_session_attention


def _attention_core(q, k, v, adj, heads):
    B, N, HD = q.shape
    d = HD // heads
    qr, kr, vr = (t.reshape(B, N, heads, d) for t in (q, k, v))
    scores = jnp.einsum("bihd,bjhd->bhij", qr, kr) / math.sqrt(d)
    alpha = masked_softmax(scores, adj[:, None, :, :], axis=-1)
    return jnp.einsum("bhij,bjhd->bihd", alpha, vr).reshape(B, N, HD)


@pytest.mark.parametrize("heads,N,bT", [(1, 8, 4), (2, 8, 8), (4, 16, 2)])
def test_fused_attention_matches_xla(heads, N, bT):
    rng = np.random.default_rng(0)
    B, HD = 6, 16
    q, k, v = (jnp.asarray(rng.standard_normal((B, N, HD)).astype(np.float32)) for _ in range(3))
    adj = jnp.asarray(rng.random((B, N, N)) < 0.35)

    fused = fused_session_attention(q, k, v, adj, heads=heads, batch_tile=bT, interpret=True)
    ref = _attention_core(q, k, v, adj, heads)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_fused_attention_isolated_rows_zero():
    rng = np.random.default_rng(1)
    B, N, HD = 2, 8, 8
    q, k, v = (jnp.asarray(rng.standard_normal((B, N, HD)).astype(np.float32)) for _ in range(3))
    adj = jnp.zeros((B, N, N), bool).at[0, 1, 0].set(True)
    out = fused_session_attention(q, k, v, adj, heads=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out[1]), 0.0, atol=1e-7)
    assert float(jnp.abs(out[0, 1]).sum()) > 0


def test_kernel_plus_beta_skip_matches_transformer_conv():
    """Kernel core + manual beta skip must reproduce the production conv.

    The kernel is unwired (documented negative result — it LOSES to XLA at
    session sizes, docs/PERFORMANCE.md); this pins its math anyway so it
    remains a valid starting point if ever revisited.
    """
    from gat_recommendation_tpu.models.base import linear

    rng = np.random.default_rng(2)
    B, N, in_dim, hidden, heads = 4, 8, 10, 16, 2
    x = jnp.asarray(rng.standard_normal((B, N, in_dim)).astype(np.float32))
    adj = jnp.asarray(rng.random((B, N, N)) < 0.3)
    params = init_transformer_conv(jax.random.key(3), in_dim, hidden // heads, heads)

    ref = transformer_conv(params, x, adj, heads=heads)

    q, k, v = (linear(params[n], x) for n in ("query", "key", "value"))
    out = fused_session_attention(q, k, v, adj, heads=heads, interpret=True)
    x_r = linear(params["skip"], x)
    gate_in = jnp.concatenate([out, x_r, out - x_r], axis=-1)
    beta = jax.nn.sigmoid(linear(params["beta"], gate_in))
    fused = beta * x_r + (1.0 - beta) * out
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-6)
