"""Ranking losses as pure functions with a uniform (loss, aux) contract.

Math parity with reference etpgt/train/losses.py:8-228 (BPR, Listwise = softmax
CE with target index 0 and temperature, Dual = alpha*listwise+(1-alpha)*bpr,
SampledSoftmax = alias of Listwise). The reference trainer duck-types the dual
loss via __code__.co_varnames (trainer.py:94-97); here every loss returns
(scalar, aux_dict) — the consciously-fixed contract called out in SURVEY.md §7.

All losses are masked over `sample_mask` so bucket-padding samples contribute
nothing (the reference has no padding; with a full mask the math is identical).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _masked_mean(per_sample: jax.Array, sample_mask: jax.Array | None) -> jax.Array:
    if sample_mask is None:
        return jnp.mean(per_sample)
    m = sample_mask.astype(per_sample.dtype)
    return jnp.sum(per_sample * m) / jnp.maximum(jnp.sum(m), 1.0)


def _scores(session_emb, targets, negatives, item_table):
    """(pos [B], neg [B, K]) dot-product scores."""
    target_emb = item_table[targets]
    neg_emb = item_table[negatives]
    pos = jnp.sum(session_emb * target_emb, axis=-1)
    neg = jnp.einsum("bkd,bd->bk", neg_emb, session_emb)
    return pos, neg


def bpr_loss(session_emb, targets, negatives, item_table, sample_mask=None):
    """-log(sigmoid(pos - neg) + 1e-8), mean over samples x negatives."""
    pos, neg = _scores(session_emb, targets, negatives, item_table)
    per = -jnp.log(jax.nn.sigmoid(pos[:, None] - neg) + 1e-8)
    loss = _masked_mean(jnp.mean(per, axis=1), sample_mask)
    return loss, {"bpr": loss}


def listwise_loss(session_emb, targets, negatives, item_table, sample_mask=None, temperature=1.0):
    """Softmax CE over [pos | negs] with target index 0 (losses.py:56-111)."""
    pos, neg = _scores(session_emb, targets, negatives, item_table)
    logits = jnp.concatenate([pos[:, None], neg], axis=1) / temperature
    per = -jax.nn.log_softmax(logits, axis=1)[:, 0]
    loss = _masked_mean(per, sample_mask)
    return loss, {"listwise": loss}


def dual_loss(
    session_emb,
    targets,
    negatives,
    item_table,
    sample_mask=None,
    alpha=0.7,
    temperature=1.0,
):
    """alpha * listwise + (1 - alpha) * bpr, aux carries the components."""
    lw, _ = listwise_loss(session_emb, targets, negatives, item_table, sample_mask, temperature)
    bp, _ = bpr_loss(session_emb, targets, negatives, item_table, sample_mask)
    total = alpha * lw + (1.0 - alpha) * bp
    return total, {"total": total, "listwise": lw, "bpr": bp}


def sampled_softmax_loss(
    session_emb, targets, negatives, item_table, sample_mask=None, temperature=1.0
):
    """Alias of listwise (losses.py:167-201)."""
    return listwise_loss(session_emb, targets, negatives, item_table, sample_mask, temperature)


# ---------------------------------------------------------------------------
# Embedding-direct variants: same math, but positive/negative embeddings are
# passed in rather than gathered from the table. Used by the sparse-gradient
# train step, where all embedding rows are gathered once up front so the
# table gradient never materializes densely.
# ---------------------------------------------------------------------------

def _scores_emb(session_emb, target_emb, neg_emb):
    pos = jnp.sum(session_emb * target_emb, axis=-1)
    neg = jnp.einsum("bkd,bd->bk", neg_emb, session_emb)
    return pos, neg


def bpr_loss_emb(session_emb, target_emb, neg_emb, sample_mask=None):
    pos, neg = _scores_emb(session_emb, target_emb, neg_emb)
    per = -jnp.log(jax.nn.sigmoid(pos[:, None] - neg) + 1e-8)
    loss = _masked_mean(jnp.mean(per, axis=1), sample_mask)
    return loss, {"bpr": loss}


def listwise_loss_emb(session_emb, target_emb, neg_emb, sample_mask=None, temperature=1.0):
    pos, neg = _scores_emb(session_emb, target_emb, neg_emb)
    logits = jnp.concatenate([pos[:, None], neg], axis=1) / temperature
    per = -jax.nn.log_softmax(logits, axis=1)[:, 0]
    loss = _masked_mean(per, sample_mask)
    return loss, {"listwise": loss}


def dual_loss_emb(session_emb, target_emb, neg_emb, sample_mask=None, alpha=0.7, temperature=1.0):
    lw, _ = listwise_loss_emb(session_emb, target_emb, neg_emb, sample_mask, temperature)
    bp, _ = bpr_loss_emb(session_emb, target_emb, neg_emb, sample_mask)
    total = alpha * lw + (1.0 - alpha) * bp
    return total, {"total": total, "listwise": lw, "bpr": bp}


LossFn = Callable  # (sess_emb, targets, negatives, item_table, sample_mask) -> (loss, aux)


def create_loss_function(loss_type: str = "dual", alpha: float = 0.7, temperature: float = 1.0) -> LossFn:
    """Factory (losses.py:204-228 parity, incl. raising on unknown types).

    The returned function carries a `.from_embeddings(sess, target_emb,
    neg_emb, mask)` attribute implementing the same loss on pre-gathered
    embeddings (for the sparse-gradient train step).
    """
    if loss_type == "bpr":
        fn = bpr_loss
        fn_emb = bpr_loss_emb
    elif loss_type == "listwise":
        fn = lambda s, t, n, e, m=None: listwise_loss(s, t, n, e, m, temperature)
        fn_emb = lambda s, te, ne, m=None: listwise_loss_emb(s, te, ne, m, temperature)
    elif loss_type == "dual":
        fn = lambda s, t, n, e, m=None: dual_loss(s, t, n, e, m, alpha, temperature)
        fn_emb = lambda s, te, ne, m=None: dual_loss_emb(s, te, ne, m, alpha, temperature)
    elif loss_type == "sampled_softmax":
        fn = lambda s, t, n, e, m=None: sampled_softmax_loss(s, t, n, e, m, temperature)
        fn_emb = lambda s, te, ne, m=None: listwise_loss_emb(s, te, ne, m, temperature)
    else:
        raise ValueError(f"Unknown loss type: {loss_type}")
    fn.from_embeddings = fn_emb  # type: ignore[attr-defined]
    return fn


# default-fn attributes for the module-level losses
bpr_loss.from_embeddings = bpr_loss_emb  # type: ignore[attr-defined]
dual_loss.from_embeddings = dual_loss_emb  # type: ignore[attr-defined]
listwise_loss.from_embeddings = listwise_loss_emb  # type: ignore[attr-defined]
