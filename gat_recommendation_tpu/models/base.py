"""Shared model pieces: item embedding, session readout, top-k predict, BPR.

Re-designs reference etpgt/model/base.py. The reference's SessionReadout is a
Python for-loop over sessions (base.py:148-188); here every readout mode is a
single masked reduction over the padded [B, N, D] node tensor.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gat_recommendation_tpu.ops.masked import masked_max, masked_mean, masked_softmax

READOUT_TYPES = ("mean", "max", "last", "attention")


# ---------------------------------------------------------------------------
# Initializers (torch-default parity so trained behavior matches the reference)
# ---------------------------------------------------------------------------

def torch_linear_init(rng: jax.Array, fan_in: int, fan_out: int, bias: bool = True) -> dict:
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).

    Weights stored [fan_in, fan_out] (JAX convention, apply = x @ w + b).
    """
    wk, bk = jax.random.split(rng)
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    p = {"w": jax.random.uniform(wk, (fan_in, fan_out), minval=-bound, maxval=bound)}
    if bias:
        p["b"] = jax.random.uniform(bk, (fan_out,), minval=-bound, maxval=bound)
    return p


def xavier_linear_init(rng: jax.Array, fan_in: int, fan_out: int, bias: bool = True) -> dict:
    """xavier_uniform weight + zero bias (used by attention readout / LapPE proj)."""
    a = math.sqrt(6.0 / (fan_in + fan_out))
    p = {"w": jax.random.uniform(rng, (fan_in, fan_out), minval=-a, maxval=a)}
    if bias:
        p["b"] = jnp.zeros((fan_out,))
    return p


def linear(p: dict, x: jax.Array) -> jax.Array:
    out = x @ p["w"]
    if "b" in p:
        out = out + p["b"]
    return out


# Tables are padded to a row multiple so they row-shard evenly over any
# reasonable 'model' mesh axis (the real catalog, 466,865, divides by nothing
# useful) AND tile evenly for Pallas row-tile kernels (the fused sparse
# AdamW uses 256-row tiles). Phantom rows are zero at init, receive zero
# gradients (no id maps to them), and stay exactly zero under AdamW (zero
# weight + zero moments) — scoring masks them to -inf (see predict_topk /
# eval steps).
TABLE_PAD_MULTIPLE = 512


def padded_rows(num_items: int, multiple: int = TABLE_PAD_MULTIPLE) -> int:
    return -(-num_items // multiple) * multiple


def init_item_embedding(rng: jax.Array, num_items: int, embedding_dim: int) -> jax.Array:
    """Embedding table [padded(num_items), D]: row 0 (padding) zero, rows
    1:num_items xavier_uniform, phantom tail rows zero.

    Parity with reference base.py:36-37 (nn.Embedding(padding_idx=0) +
    xavier_uniform_ on weight[1:], whose torch fan computation gives
    a = sqrt(6 / (num_items - 1 + D))).
    """
    rows = padded_rows(num_items)
    a = math.sqrt(6.0 / (num_items - 1 + embedding_dim))
    table = jax.random.uniform(rng, (rows, embedding_dim), minval=-a, maxval=a)
    table = table.at[0].set(0.0)
    if rows > num_items:
        table = table.at[num_items:].set(0.0)
    return table


def padding_row_grad_mask(num_items: int) -> jax.Array:
    """Multiplier zeroing gradient updates to embedding row 0 (padding_idx parity)."""
    return jnp.ones((num_items, 1)).at[0].set(0.0)


# ---------------------------------------------------------------------------
# Session readout
# ---------------------------------------------------------------------------

def init_readout(rng: jax.Array, hidden_dim: int, readout_type: str) -> dict:
    if readout_type not in READOUT_TYPES:
        raise ValueError(f"Unknown readout type: {readout_type}")
    if readout_type == "attention":
        return {"attention": xavier_linear_init(rng, hidden_dim, 1)}
    return {}


def apply_readout(
    params: dict,
    x: jax.Array,
    node_mask: jax.Array,
    num_nodes: jax.Array,
    readout_type: str,
) -> jax.Array:
    """Pool node embeddings [B, N, D] -> session embeddings [B, D].

    'last' parity note: the reference's nodes are torch.unique-sorted item ids
    and its 'last' readout picks the final *local index* (base.py:166-172) —
    i.e. the largest item id, not the temporally last event. Our node layout is
    the same ascending order, so index num_nodes-1 matches exactly.
    """
    if readout_type == "mean":
        return masked_mean(x, node_mask, axis=1)
    if readout_type == "max":
        return masked_max(x, node_mask, axis=1)
    if readout_type == "last":
        idx = jnp.maximum(num_nodes - 1, 0)
        return jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0, :]
    if readout_type == "attention":
        scores = linear(params["attention"], x)[..., 0]  # [B, N]
        weights = masked_softmax(scores, node_mask, axis=1)
        return jnp.einsum("bn,bnd->bd", weights, x)
    raise ValueError(f"Unknown readout type: {readout_type}")


# ---------------------------------------------------------------------------
# Scoring + default loss
# ---------------------------------------------------------------------------

def predict_topk(
    session_embeddings: jax.Array,
    item_embeddings: jax.Array,
    k: int = 20,
    num_items: int | None = None,
):
    """Full-catalog dot-product scores + top-k (reference base.py:59-78).

    Note: like the reference, eval does NOT mask seen items (serving does).
    `num_items` masks the padded phantom tail of the table (scores -> -inf).
    Exact selection via the two-level chunk-max scheme (ops/scoring.py;
    4x faster than lax.top_k at catalog scale, identical results).
    Returns (top_k_indices [B, k], top_k_scores [B, k]).
    """
    from gat_recommendation_tpu.ops.scoring import full_catalog_topk

    top_scores, top_idx = full_catalog_topk(
        session_embeddings, item_embeddings, k, num_items
    )
    return top_idx, top_scores


def mask_phantom(scores: jax.Array, num_items: int | None) -> jax.Array:
    """-inf the padded phantom columns beyond the logical catalog size."""
    if num_items is None or scores.shape[-1] <= num_items:
        return scores
    col = jnp.arange(scores.shape[-1])
    return jnp.where(col < num_items, scores, -jnp.inf)


def bpr_loss_from_embeddings(
    session_embeddings: jax.Array,
    target_emb: jax.Array,
    negative_emb: jax.Array,
    sample_mask: jax.Array | None = None,
) -> jax.Array:
    """BPR: -log(sigmoid(pos - neg) + 1e-8), mean over (valid) samples x negatives.

    Parity with reference base.py:80-113 / losses.py:8-53.
    """
    pos = jnp.sum(session_embeddings * target_emb, axis=-1)  # [B]
    neg = jnp.einsum("bkd,bd->bk", negative_emb, session_embeddings)  # [B, K]
    per = -jnp.log(jax.nn.sigmoid(pos[:, None] - neg) + 1e-8)  # [B, K]
    if sample_mask is None:
        return jnp.mean(per)
    m = sample_mask.astype(per.dtype)[:, None]
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m) * per.shape[1], 1.0)
