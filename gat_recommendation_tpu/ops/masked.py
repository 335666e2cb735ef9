"""Masked dense primitives (softmax / mean / max / batch-norm under padding).

These are the TPU-native replacements for torch-scatter's segment ops: the
per-destination "segment softmax" over incoming edges (PyG softmax semantics,
used by TransformerConv/GATConv) becomes a row-masked softmax over the dense
adjacency axis, and rows with no valid entries produce exact zeros — matching
scatter-sum-of-nothing in PyG for isolated nodes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def masked_softmax(scores: jax.Array, mask: jax.Array, axis: int = -1) -> jax.Array:
    """Softmax over `axis` restricted to mask; all-masked rows -> zeros."""
    neg = jnp.where(mask, scores, _NEG_INF)
    m = jnp.max(neg, axis=axis, keepdims=True)
    # Guard all-masked rows so exp doesn't overflow after subtracting -inf.
    m = jnp.where(m <= _NEG_INF / 2, 0.0, m)
    e = jnp.exp(neg - m) * mask.astype(scores.dtype)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, 1e-16)


def masked_mean(x: jax.Array, mask: jax.Array, axis: int = 1) -> jax.Array:
    """Mean of x over `axis` counting only masked entries (empty -> 0)."""
    m = jnp.expand_dims(mask.astype(x.dtype), -1)
    total = jnp.sum(x * m, axis=axis)
    count = jnp.sum(m, axis=axis)
    return total / jnp.maximum(count, 1.0)


def masked_max(x: jax.Array, mask: jax.Array, axis: int = 1) -> jax.Array:
    """Max of x over `axis` among masked entries (empty -> 0)."""
    m = jnp.expand_dims(mask, -1)
    filled = jnp.where(m, x, _NEG_INF)
    out = jnp.max(filled, axis=axis)
    any_valid = jnp.any(mask, axis=axis, keepdims=True)
    return jnp.where(any_valid, out, 0.0)


def init_batch_norm(dim: int) -> tuple[dict, dict]:
    """Returns (params, state) for a BatchNorm1d-equivalent layer."""
    params = {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
    state = {
        "mean": jnp.zeros((dim,)),
        "var": jnp.ones((dim,)),
        "count": jnp.zeros((), dtype=jnp.float32),
    }
    return params, state


def masked_batch_norm(
    params: dict,
    state: dict,
    x: jax.Array,
    mask: jax.Array,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> tuple[jax.Array, dict]:
    """BatchNorm over the flattened node axis, counting only valid nodes.

    Parity with torch.nn.BatchNorm1d applied to the ragged [num_nodes, D]
    node tensor in the reference models (e.g. graph_transformer.py:173):
    normalization uses biased batch variance; running stats are EMA-updated
    with the unbiased variance.

    x: [B, N, D]; mask: [B, N]. Returns (normalized x, new state).
    """
    if train:
        m = jnp.expand_dims(mask.astype(x.dtype), -1)
        count = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(x * m, axis=(0, 1)) / count
        var = jnp.sum(jnp.square(x - mean) * m, axis=(0, 1)) / count
        unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
            "count": state["count"] + count,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state

    inv = jax.lax.rsqrt(var + eps)
    out = (x - mean) * inv * params["scale"] + params["bias"]
    return out, new_state


def dropout(rng: jax.Array, x: jax.Array, rate: float, train: bool) -> jax.Array:
    """Inverted dropout (torch semantics: scale by 1/(1-p) at train time)."""
    if not train or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
