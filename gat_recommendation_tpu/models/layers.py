"""Graph conv layers as batched dense masked attention/aggregation.

Each layer reproduces the math of its PyG counterpart (TransformerConv /
GATConv / SAGEConv as configured by the reference models) but runs on the
fixed-shape [B, N, D] node tensor with a per-session adjacency mask
adj[b, dst, src] — MXU matmuls + VPU masking instead of gather/scatter.

Message direction parity: PyG flow='source_to_target' aggregates messages at
edge_index[1]; our adjacency is indexed adj[dst, src], so attention rows are
destinations and the softmax axis is the source axis.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gat_recommendation_tpu.models.base import linear, torch_linear_init
from gat_recommendation_tpu.ops.masked import masked_softmax


def _glorot(rng: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """PyG glorot: U(±sqrt(6/(size(-2)+size(-1))))."""
    a = math.sqrt(6.0 / (shape[-2] + shape[-1]))
    return jax.random.uniform(rng, shape, minval=-a, maxval=a)


def _attn_dropout(rng, alpha, rate, train):
    if not train or rate <= 0.0 or rng is None:
        return alpha
    keep = jax.random.bernoulli(rng, 1.0 - rate, alpha.shape)
    return jnp.where(keep, alpha / (1.0 - rate), 0.0)


# ---------------------------------------------------------------------------
# TransformerConv (parity with PyG TransformerConv(in, out//H, heads=H,
# concat=True, beta=True) as used in reference graph_transformer.py:73-124)
# ---------------------------------------------------------------------------

def init_transformer_conv(rng: jax.Array, in_dim: int, head_dim: int, heads: int) -> dict:
    kq, kk, kv, ks, kb = jax.random.split(rng, 5)
    hd = heads * head_dim
    return {
        "query": torch_linear_init(kq, in_dim, hd),
        "key": torch_linear_init(kk, in_dim, hd),
        "value": torch_linear_init(kv, in_dim, hd),
        "skip": torch_linear_init(ks, in_dim, hd),
        "beta": torch_linear_init(kb, 3 * hd, 1, bias=False),
    }


def transformer_conv(
    params: dict,
    x: jax.Array,
    adj: jax.Array,
    *,
    heads: int,
    dropout_rate: float = 0.0,
    train: bool = False,
    rng: jax.Array | None = None,
) -> jax.Array:
    """out_i = beta*W_skip x_i + (1-beta) * sum_j softmax_j(q_i.k_j/sqrt(d)) v_j.

    x: [B, N, in]; adj: [B, N, N] bool (adj[b, i, j]: edge j->i). Returns
    [B, N, heads*head_dim]. Destinations with no in-edges get attention
    output 0 (scatter-of-nothing parity) before the beta-gated skip.

    The attention core stays in XLA deliberately: a Pallas fused kernel
    (ops/pallas/session_attention.py) measured SLOWER at every node bucket
    (0.31x at N=8 ... 0.79x at N=56) — sessions are far smaller than an MXU
    tile, so there is no flash-attention-style fusion win here (negative
    result, docs/PERFORMANCE.md).
    """
    B, N, _ = x.shape
    hd = params["query"]["w"].shape[1]
    d = hd // heads

    q = linear(params["query"], x).reshape(B, N, heads, d)
    k = linear(params["key"], x).reshape(B, N, heads, d)
    v = linear(params["value"], x).reshape(B, N, heads, d)

    scores = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(d)
    alpha = masked_softmax(scores, adj[:, None, :, :], axis=-1)  # [B, H, N, N]
    alpha = _attn_dropout(rng, alpha, dropout_rate, train)
    out = jnp.einsum("bhij,bjhd->bihd", alpha, v, preferred_element_type=jnp.float32)
    out = out.reshape(B, N, hd)

    x_r = linear(params["skip"], x)
    gate_in = jnp.concatenate([out, x_r, out - x_r], axis=-1)
    beta = jax.nn.sigmoid(linear(params["beta"], gate_in))  # [B, N, 1]
    return beta * x_r + (1.0 - beta) * out


# ---------------------------------------------------------------------------
# GATConv (parity with PyG GATConv(in, out, heads=H, concat=...) defaults:
# negative_slope=0.2, add_self_loops=True — reference gat.py:42-111)
# ---------------------------------------------------------------------------

def init_gat_conv(rng: jax.Array, in_dim: int, out_dim: int, heads: int, concat: bool) -> dict:
    kl, ks, kd = jax.random.split(rng, 3)
    return {
        "lin": {"w": _glorot(kl, (in_dim, heads * out_dim))},
        "att_src": _glorot(ks, (heads, out_dim)),
        "att_dst": _glorot(kd, (heads, out_dim)),
        "bias": jnp.zeros((heads * out_dim if concat else out_dim,)),
    }


def gat_conv(
    params: dict,
    x: jax.Array,
    adj: jax.Array,
    node_mask: jax.Array,
    *,
    heads: int,
    concat: bool,
    negative_slope: float = 0.2,
    dropout_rate: float = 0.0,
    train: bool = False,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Additive attention: alpha_ij = softmax_j LeakyReLU(a_dst.Wx_i + a_src.Wx_j).

    Self-loops are forced on the diagonal for valid nodes (PyG GATConv
    add_self_loops=True), so every valid node attends at least to itself.
    """
    B, N, _ = x.shape
    out_dim = params["att_src"].shape[1]

    h = (x @ params["lin"]["w"]).reshape(B, N, heads, out_dim)
    a_src = jnp.einsum("bnhc,hc->bnh", h, params["att_src"])  # source term (j)
    a_dst = jnp.einsum("bnhc,hc->bnh", h, params["att_dst"])  # dest term (i)

    e = a_dst[:, :, None, :] + a_src[:, None, :, :]  # [B, i, j, H]
    e = jax.nn.leaky_relu(e, negative_slope)
    e = jnp.transpose(e, (0, 3, 1, 2))  # [B, H, i, j]

    eye = jnp.eye(N, dtype=bool)
    adj_sl = jnp.logical_or(adj, eye[None]) & node_mask[:, None, :] & node_mask[:, :, None]
    alpha = masked_softmax(e, adj_sl[:, None, :, :], axis=-1)
    alpha = _attn_dropout(rng, alpha, dropout_rate, train)

    out = jnp.einsum("bhij,bjhc->bihc", alpha, h, preferred_element_type=jnp.float32)
    if concat:
        out = out.reshape(B, N, heads * out_dim)
    else:
        out = jnp.mean(out, axis=2)
    return out + params["bias"]


# ---------------------------------------------------------------------------
# SAGEConv (parity with PyG SAGEConv(in, out, aggr=...) defaults:
# root_weight=True, normalize=False — reference graphsage.py:43-78)
# ---------------------------------------------------------------------------

def init_sage_conv(
    rng: jax.Array, in_dim: int, out_dim: int, aggregator: str = "mean"
) -> dict:
    kl, kr, klstm = jax.random.split(rng, 3)
    params = {
        "lin_l": torch_linear_init(kl, in_dim, out_dim, bias=True),
        "lin_r": torch_linear_init(kr, in_dim, out_dim, bias=False),
    }
    if aggregator == "lstm":
        # LSTMCell(in_dim -> in_dim), torch-default U(±1/sqrt(hidden)) init
        # (PyG SAGEConv aggr='lstm' uses an LSTM with hidden = in_channels).
        k1, k2, k3, k4 = jax.random.split(klstm, 4)
        bound = 1.0 / math.sqrt(in_dim)
        u = lambda k, shape: jax.random.uniform(k, shape, minval=-bound, maxval=bound)
        params["lstm"] = {
            "w_ih": u(k1, (in_dim, 4 * in_dim)),
            "w_hh": u(k2, (in_dim, 4 * in_dim)),
            "b_ih": u(k3, (4 * in_dim,)),
            "b_hh": u(k4, (4 * in_dim,)),
        }
    return params


def sage_conv(
    params: dict,
    x: jax.Array,
    adj: jax.Array,
    *,
    aggregator: str = "mean",
) -> jax.Array:
    """out_i = W_l . aggr({x_j : j->i}) + W_r . x_i (empty neighborhood -> 0)."""
    a = adj.astype(x.dtype)
    if aggregator == "mean":
        deg = jnp.sum(a, axis=-1, keepdims=True)
        agg = jnp.einsum("bij,bjd->bid", a, x, preferred_element_type=jnp.float32)
        agg = agg / jnp.maximum(deg, 1.0)
    elif aggregator == "max":
        filled = jnp.where(adj[..., None], x[:, None, :, :], -1e30)
        agg = jnp.max(filled, axis=2)
        has_nbr = jnp.any(adj, axis=-1, keepdims=True)
        agg = jnp.where(has_nbr, agg, 0.0)
    elif aggregator == "lstm":
        agg = _masked_lstm_aggregate(params["lstm"], x, adj)
    else:
        raise ValueError(f"Unknown SAGE aggregator: {aggregator}")
    return linear(params["lin_l"], agg) + linear(params["lin_r"], x)


def _masked_lstm_aggregate(p: dict, x: jax.Array, adj: jax.Array) -> jax.Array:
    """LSTM over each destination's neighbor sequence in ascending source
    order (PyG SAGEConv aggr='lstm' semantics; neighbor order there is edge
    order, which in this framework is sorted local index). Non-neighbor
    steps are masked: the carry passes through unchanged. Empty
    neighborhoods aggregate to zero.
    """
    B, N, D = x.shape

    def cell(carry, inputs):
        h, c = carry  # [B, N_dst, D]
        x_j, mask_j = inputs  # x_j: [B, D]; mask_j: [B, N_dst]
        gates = x_j[:, None, :] @ p["w_ih"] + h @ p["w_hh"] + p["b_ih"] + p["b_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        m = mask_j[..., None]
        return (jnp.where(m, h_new, h), jnp.where(m, c_new, c)), None

    h0 = jnp.zeros((B, N, D), x.dtype)
    (h, _), _ = jax.lax.scan(
        cell,
        (h0, h0),
        (jnp.moveaxis(x, 1, 0), jnp.moveaxis(adj, 2, 0)),  # iterate sources j
    )
    return h
