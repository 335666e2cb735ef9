"""Full-catalog top-k scoring, TPU-tuned.

The reference scores sessions against the whole catalog with one matmul and
torch.topk (etpgt/model/base.py:59-78). On TPU the matmul runs at MXU speed
(~0.8 ms for B=512 x V=466,880 x D=256) but `lax.top_k` lowers to a full
variadic sort of the [B, V] score matrix and costs ~19 ms — 95% of the eval
step. This module provides two faster selectors (measured on TPU v5e,
B=512, V=466,880, k=20):

  * two_level_topk — EXACT, 5.4 ms (3.6x; docs/PERFORMANCE.md table is the
    canonical measurement — an earlier round measured 4.7 ms, within the
    relay's run-to-run spread): per-chunk max over contiguous width-C
    chunks, top-k over the [B, V/C] chunk maxes, gather the k winning
    chunks' scores, exact re-rank of the k*C candidates.
  * approx_topk    — ~1.1 ms (17x): TPU PartialReduce (`lax.approx_max_k`)
    over L candidates + exact re-rank. ~97.5% top-20 index agreement with
    exact at L=128 on worst-case (i.i.d. random) scores; use for in-training
    eval where measurement noise dominates, never for published numbers.

Exactness of two_level_topk (including ties): chunks are CONTIGUOUS index
ranges and both levels break ties by lowest index, matching lax.top_k.
Level 1 (membership): if a candidate e (value v, global index g, chunk c)
is excluded at level 1, then k chunks ranked above c each contain an
element with value > v, or value >= v in a lower-index chunk — i.e. with
global index < g. Either way at least k elements precede e in (value desc,
index asc) order, so exact top-k excludes e too. Level 2 (ranking): the k
winning chunks are re-SORTED by chunk index before the candidate gather,
so candidate position order equals global index order and lax.top_k's
position tie-break over the candidates equals the dense tie-break. (Without
the sort, candidates sit in chunk-RANK order and a cross-chunk tie can
resolve to the higher global index — e.g. scores [5,0,10,5], chunk=2, k=2
gave [2,3] where dense gives [2,0].)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_CHUNK = 32
DEFAULT_CANDIDATES = 128
# Below this row count the dense sort is cheap and always used.
MIN_ROWS_FOR_TWO_LEVEL = 16_384


def _masked_scores(session_embeddings, item_embeddings, num_items):
    scores = jnp.dot(
        session_embeddings, item_embeddings.T, preferred_element_type=jnp.float32
    )
    V = item_embeddings.shape[0]
    if num_items is not None and V > num_items:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
        scores = jnp.where(col < num_items, scores, -jnp.inf)
    return scores


def dense_topk(session_embeddings, item_embeddings, k, num_items=None):
    """Reference scorer: one matmul + lax.top_k (the parity oracle)."""
    scores = _masked_scores(session_embeddings, item_embeddings, num_items)
    s, i = jax.lax.top_k(scores, k)
    return s, i.astype(jnp.int32)


def two_level_topk_scores(scores, k: int, chunk: int = DEFAULT_CHUNK):
    """Exact top-k over a PRECOMPUTED [B, V] score matrix.

    Same algorithm and tie semantics as two_level_topk (module docstring);
    columns are -inf-padded to a chunk multiple, so any V works. Used
    standalone and as the shard-local phase of parallel/topk.sharded_topk,
    where V = shard_rows (466k/8 = 58k and up — well past the dense-sort
    crossover). Falls back to lax.top_k for small V.
    """
    B, V = scores.shape
    if V < MIN_ROWS_FOR_TWO_LEVEL or V // chunk < k:
        s, i = jax.lax.top_k(scores, k)
        return s, i.astype(jnp.int32)
    pad = (-V) % chunk
    if pad:
        # -inf tail columns: never outrank a finite score, and sit at the
        # highest indices so the lowest-index tie-break is unaffected.
        scores = jnp.concatenate(
            [scores, jnp.full((B, pad), -jnp.inf, scores.dtype)], axis=1
        )
    NC = scores.shape[1] // chunk
    chunked = scores.reshape(B, NC, chunk)
    maxes = chunked.max(axis=-1)  # [B, NC]
    _, top_chunks = jax.lax.top_k(maxes, k)  # [B, k]
    # Ascending chunk order => candidate positions ascend in global index,
    # making the level-2 tie-break identical to dense lax.top_k (see module
    # docstring). Membership is unaffected; the sort of k ints is free.
    top_chunks = jnp.sort(top_chunks, axis=1)
    cand = jnp.take_along_axis(chunked, top_chunks[:, :, None], axis=1)
    cand = cand.reshape(B, k * chunk)
    base = top_chunks[:, :, None] * chunk + jnp.arange(chunk, dtype=jnp.int32)
    base = base.reshape(B, k * chunk)
    s, pos = jax.lax.top_k(cand, k)
    return s, jnp.take_along_axis(base, pos, axis=1).astype(jnp.int32)


def two_level_topk(
    session_embeddings,
    item_embeddings,
    k: int,
    num_items=None,
    chunk: int = DEFAULT_CHUNK,
):
    """Exact top-k via chunk-max preselection (see module docstring).

    Falls back to dense_topk when V is small, not chunk-divisible (tables
    are padded to a TABLE_PAD_MULTIPLE=512-row multiple, so 8/16/32/64
    always divide), or has fewer than k chunks.
    """
    V = item_embeddings.shape[0]
    if V < MIN_ROWS_FOR_TWO_LEVEL or V % chunk or V // chunk < k:
        return dense_topk(session_embeddings, item_embeddings, k, num_items)
    scores = _masked_scores(session_embeddings, item_embeddings, num_items)
    return two_level_topk_scores(scores, k, chunk)


def approx_topk(
    session_embeddings,
    item_embeddings,
    k: int,
    num_items=None,
    candidates: int = DEFAULT_CANDIDATES,
):
    """approx_max_k over L candidates + exact re-rank (NOT exact; see above)."""
    scores = _masked_scores(session_embeddings, item_embeddings, num_items)
    L = max(candidates, k)
    if L >= scores.shape[-1]:
        return dense_topk(session_embeddings, item_embeddings, k, num_items)
    s, i = jax.lax.approx_max_k(scores, L)
    s2, pos = jax.lax.top_k(s, k)
    return s2, jnp.take_along_axis(i, pos, axis=1).astype(jnp.int32)


def full_catalog_topk(
    session_embeddings,
    item_embeddings,
    k: int,
    num_items=None,
    method: str = "auto",
    **kwargs,
):
    """Dispatch: 'auto' (exact; two-level when profitable) | 'dense' |
    'two_level' | 'approx'. Returns (scores [B, k], indices [B, k] int32)."""
    if method in ("auto", "two_level"):
        return two_level_topk(session_embeddings, item_embeddings, k, num_items, **kwargs)
    if method == "dense":
        return dense_topk(session_embeddings, item_embeddings, k, num_items)
    if method == "approx":
        return approx_topk(session_embeddings, item_embeddings, k, num_items, **kwargs)
    raise ValueError(f"Unknown top-k method: {method}")
