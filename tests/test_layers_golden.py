"""Golden math-parity tests: dense masked layers vs naive edge-loop references.

The naive implementations below follow PyG's documented per-edge semantics
(TransformerConv with beta gate, GATConv with self-loops, SAGEConv mean/max)
exactly, loop-by-loop. The dense [B,N,N] implementations must agree to
float tolerance — this is the parity hinge for the 38.28% Recall@10 target
(SURVEY.md §7 hard part #2).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gat_recommendation_tpu.models.layers import (
    gat_conv,
    init_gat_conv,
    init_sage_conv,
    init_transformer_conv,
    sage_conv,
    transformer_conv,
)


def random_graph(rng, n, p=0.4):
    adj = rng.random((n, n)) < p  # adj[dst, src]
    np.fill_diagonal(adj, rng.random(n) < 0.2)
    return adj


def as_batch(x, adj, n_pad):
    """Embed a single [n,*] graph into a padded [1, n_pad, *] batch."""
    n = x.shape[0]
    xb = np.zeros((1, n_pad, x.shape[1]), dtype=np.float32)
    xb[0, :n] = x
    ab = np.zeros((1, n_pad, n_pad), dtype=bool)
    ab[0, :n, :n] = adj
    mask = np.zeros((1, n_pad), dtype=bool)
    mask[0, :n] = True
    return jnp.asarray(xb), jnp.asarray(ab), jnp.asarray(mask)


# ---------------------------------------------------------------------------
# Naive references
# ---------------------------------------------------------------------------

def naive_transformer_conv(p, x, adj, heads):
    n = x.shape[0]
    hd = p["query"]["w"].shape[1]
    d = hd // heads
    q = (x @ p["query"]["w"] + p["query"]["b"]).reshape(n, heads, d)
    k = (x @ p["key"]["w"] + p["key"]["b"]).reshape(n, heads, d)
    v = (x @ p["value"]["w"] + p["value"]["b"]).reshape(n, heads, d)
    out = np.zeros((n, heads, d))
    for i in range(n):
        srcs = [j for j in range(n) if adj[i, j]]
        for h in range(heads):
            if srcs:
                logits = np.array([q[i, h] @ k[j, h] / math.sqrt(d) for j in srcs])
                e = np.exp(logits - logits.max())
                alpha = e / e.sum()
                out[i, h] = sum(a * v[j, h] for a, j in zip(alpha, srcs))
    out = out.reshape(n, hd)
    x_r = x @ p["skip"]["w"] + p["skip"]["b"]
    gate = np.concatenate([out, x_r, out - x_r], axis=-1) @ p["beta"]["w"]
    beta = 1.0 / (1.0 + np.exp(-gate))
    return beta * x_r + (1 - beta) * out


def naive_gat_conv(p, x, adj, heads, concat, slope=0.2):
    n = x.shape[0]
    out_dim = p["att_src"].shape[1]
    h = (x @ p["lin"]["w"]).reshape(n, heads, out_dim)
    a_src = np.einsum("nhc,hc->nh", h, p["att_src"])
    a_dst = np.einsum("nhc,hc->nh", h, p["att_dst"])
    adj_sl = adj.copy()
    np.fill_diagonal(adj_sl, True)  # add_self_loops=True
    out = np.zeros((n, heads, out_dim))
    for i in range(n):
        srcs = [j for j in range(n) if adj_sl[i, j]]
        for hh in range(heads):
            logits = np.array([a_dst[i, hh] + a_src[j, hh] for j in srcs])
            logits = np.where(logits > 0, logits, slope * logits)
            e = np.exp(logits - logits.max())
            alpha = e / e.sum()
            out[i, hh] = sum(a * h[j, hh] for a, j in zip(alpha, srcs))
    if concat:
        return out.reshape(n, heads * out_dim) + p["bias"]
    return out.mean(axis=1) + p["bias"]


def naive_sage_conv(p, x, adj, aggregator):
    n = x.shape[0]
    agg = np.zeros((n, x.shape[1]))
    for i in range(n):
        srcs = [j for j in range(n) if adj[i, j]]
        if srcs:
            stack = np.stack([x[j] for j in srcs])
            agg[i] = stack.mean(axis=0) if aggregator == "mean" else stack.max(axis=0)
    return (agg @ p["lin_l"]["w"] + p["lin_l"]["b"]) + x @ p["lin_r"]["w"]


# ---------------------------------------------------------------------------
# Parity tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("heads", [1, 2, 4])
def test_transformer_conv_matches_naive(heads):
    rng = np.random.default_rng(0)
    n, in_dim, hidden = 7, 12, 8
    x = rng.standard_normal((n, in_dim)).astype(np.float32)
    adj = random_graph(rng, n)
    params = init_transformer_conv(jax.random.key(1), in_dim, hidden // heads, heads)
    p_np = jax.tree.map(np.asarray, params)

    xb, ab, _ = as_batch(x, adj, n_pad=8)
    dense = np.asarray(transformer_conv(params, xb, ab, heads=heads))[0, :n]
    naive = naive_transformer_conv(p_np, x, adj, heads)
    np.testing.assert_allclose(dense, naive, rtol=1e-4, atol=1e-5)


def test_transformer_conv_isolated_node_gets_skip():
    """Node with no in-edges: attention out = 0, result = beta * x_r."""
    rng = np.random.default_rng(1)
    n, in_dim, hidden, heads = 4, 6, 8, 2
    x = rng.standard_normal((n, in_dim)).astype(np.float32)
    adj = np.zeros((n, n), dtype=bool)
    adj[1, 0] = True  # only node 1 has an in-edge; node 3 fully isolated
    params = init_transformer_conv(jax.random.key(2), in_dim, hidden // heads, heads)
    p_np = jax.tree.map(np.asarray, params)

    xb, ab, _ = as_batch(x, adj, n_pad=8)
    dense = np.asarray(transformer_conv(params, xb, ab, heads=heads))[0]
    x_r = x @ p_np["skip"]["w"] + p_np["skip"]["b"]
    gate = np.concatenate([np.zeros_like(x_r), x_r, -x_r], axis=-1) @ p_np["beta"]["w"]
    beta = 1.0 / (1.0 + np.exp(-gate))
    np.testing.assert_allclose(dense[3], (beta * x_r)[3], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("heads,concat", [(1, False), (2, False), (2, True), (4, False)])
def test_gat_conv_matches_naive(heads, concat):
    rng = np.random.default_rng(2)
    n, in_dim, out_dim = 6, 10, 5
    x = rng.standard_normal((n, in_dim)).astype(np.float32)
    adj = random_graph(rng, n)
    params = init_gat_conv(jax.random.key(3), in_dim, out_dim, heads, concat)
    p_np = jax.tree.map(np.asarray, params)

    xb, ab, mask = as_batch(x, adj, n_pad=8)
    dense = np.asarray(
        gat_conv(params, xb, ab, mask, heads=heads, concat=concat)
    )[0, :n]
    naive = naive_gat_conv(p_np, x, adj, heads, concat)
    np.testing.assert_allclose(dense, naive, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("aggregator", ["mean", "max"])
def test_sage_conv_matches_naive(aggregator):
    rng = np.random.default_rng(3)
    n, in_dim, out_dim = 6, 9, 7
    x = rng.standard_normal((n, in_dim)).astype(np.float32)
    adj = random_graph(rng, n)
    params = init_sage_conv(jax.random.key(4), in_dim, out_dim)
    p_np = jax.tree.map(np.asarray, params)

    xb, ab, _ = as_batch(x, adj, n_pad=8)
    dense = np.asarray(sage_conv(params, xb, ab, aggregator=aggregator))[0, :n]
    naive = naive_sage_conv(p_np, x, adj, aggregator)
    np.testing.assert_allclose(dense, naive, rtol=1e-4, atol=1e-5)


def naive_lstm_aggregate(p, x, adj):
    """Per-dst LSTM over neighbors in ascending source order."""
    n, d = x.shape
    out = np.zeros((n, d))
    for i in range(n):
        h = np.zeros(d)
        c = np.zeros(d)
        for j in range(n):
            if not adj[i, j]:
                continue
            gates = x[j] @ p["w_ih"] + h @ p["w_hh"] + p["b_ih"] + p["b_hh"]
            ii, ff, gg, oo = np.split(gates, 4)
            sig = lambda z: 1.0 / (1.0 + np.exp(-z))
            c = sig(ff) * c + sig(ii) * np.tanh(gg)
            h = sig(oo) * np.tanh(c)
        out[i] = h
    return out


def test_sage_lstm_matches_naive():
    rng = np.random.default_rng(7)
    n, in_dim, out_dim = 6, 5, 4
    x = rng.standard_normal((n, in_dim)).astype(np.float32)
    adj = random_graph(rng, n)
    params = init_sage_conv(jax.random.key(8), in_dim, out_dim, aggregator="lstm")
    p_np = jax.tree.map(np.asarray, params)

    xb, ab, _ = as_batch(x, adj, n_pad=8)
    dense = np.asarray(sage_conv(params, xb, ab, aggregator="lstm"))[0, :n]
    agg = naive_lstm_aggregate(p_np["lstm"], x, adj)
    naive = agg @ p_np["lin_l"]["w"] + p_np["lin_l"]["b"] + x @ p_np["lin_r"]["w"]
    np.testing.assert_allclose(dense, naive, rtol=1e-4, atol=1e-5)


def test_sage_unknown_aggregator_raises():
    params = init_sage_conv(jax.random.key(0), 4, 4)
    x = jnp.zeros((1, 4, 4))
    adj = jnp.zeros((1, 4, 4), dtype=bool)
    with pytest.raises(ValueError):
        sage_conv(params, x, adj, aggregator="bogus")


def test_masked_batch_norm_matches_unmasked():
    """With a full mask, masked BN must equal plain batch normalization."""
    from gat_recommendation_tpu.ops.masked import init_batch_norm, masked_batch_norm

    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, 5, 8)).astype(np.float32)
    mask = np.ones((3, 5), dtype=bool)
    params, state = init_batch_norm(8)
    out, new_state = masked_batch_norm(params, state, jnp.asarray(x), jnp.asarray(mask), True)

    flat = x.reshape(-1, 8)
    expect = (flat - flat.mean(0)) / np.sqrt(flat.var(0) + 1e-5)
    np.testing.assert_allclose(np.asarray(out).reshape(-1, 8), expect, rtol=1e-4, atol=1e-5)
    # Running stats EMA: 0.9*init + 0.1*batch (unbiased var).
    count = flat.shape[0]
    np.testing.assert_allclose(
        np.asarray(new_state["var"]),
        0.9 * 1.0 + 0.1 * flat.var(0) * count / (count - 1),
        rtol=1e-4,
    )


def test_masked_batch_norm_ignores_padding():
    from gat_recommendation_tpu.ops.masked import init_batch_norm, masked_batch_norm

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 4, 3)).astype(np.float32)
    mask = np.array([[True, True, False, False], [True, False, False, False]])
    params, state = init_batch_norm(3)
    out1, s1 = masked_batch_norm(params, state, jnp.asarray(x), jnp.asarray(mask), True)

    # Corrupt padded entries wildly: valid outputs must not change.
    x2 = x.copy()
    x2[~np.broadcast_to(mask[..., None], x.shape).copy()] = 1e6
    out2, s2 = masked_batch_norm(params, state, jnp.asarray(x2), jnp.asarray(mask), True)
    np.testing.assert_allclose(
        np.asarray(out1)[mask], np.asarray(out2)[mask], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(s1["mean"]), np.asarray(s2["mean"]), rtol=1e-5)
