"""Fused scoring matmul + per-chunk max (Pallas TPU) — MEASURED LOSER.

Phase 1 of the exact two-level top-k (ops/scoring.py) needs the [B, V]
score matrix AND its per-chunk maxes. In XLA those are two HBM passes
(matmul writes scores, reduce re-reads them — ~2.4 ms at B=512,
V=467,456). The traffic model says fusing them into one pass should win;
it does not: **measured 16.4 ms vs 5-7 ms for the XLA two-level path.**
Mosaic rejects the lane-splitting reshape [B,V]->[B,V/C,C], so the chunk
max must run as C-lane cross-lane reduces (16 per 512-wide tile, ~29k
total), which the VPU executes far more slowly than XLA's fused
row-reduce. Kept for the record with interpret-mode correctness tests;
NOT wired into any default path — ops/scoring.two_level_topk is the
production selector. Revisit if Mosaic gains minor-dim reshapes.

The chunk maxes are emitted TRANSPOSED ([V/chunk, B]) so the per-grid-step
output block ([TILE_V/chunk, TILE_B] = [16, 256]) is lane-aligned; the
caller transposes once in XLA (cheap, [B, V/32] is ~2% of the scores).

Exactness: phase 2 gathers candidate scores from the scores buffer THIS
kernel wrote, so selection and ranking see identical values — the
two-level tie-correctness proof in ops/scoring.py carries over unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 256
TILE_V = 512
CHUNK = 32


def supports(B: int, V: int, dim: int) -> bool:
    return B % TILE_B == 0 and V % TILE_V == 0


def _kernel(num_items, dim, sess_ref, table_ref, scores_ref, maxes_t_ref):
    j = pl.program_id(1)
    s = jnp.dot(
        sess_ref[:], table_ref[:].T, preferred_element_type=jnp.float32
    )  # [TILE_B, TILE_V]
    col = j * TILE_V + jax.lax.broadcasted_iota(jnp.int32, (1, TILE_V), 1)
    s = jnp.where(col < num_items, s, -jnp.inf)
    scores_ref[:] = s
    # Chunk maxes via unrolled contiguous slices (Mosaic rejects the
    # lane-splitting reshape [B, V] -> [B, V/C, C]); each row write is a
    # full [TILE_B] lane vector.
    for c in range(TILE_V // CHUNK):
        maxes_t_ref[c, :] = jnp.max(s[:, c * CHUNK : (c + 1) * CHUNK], axis=1)


def fused_score_chunkmax(
    session_embeddings: jax.Array,
    item_embeddings: jax.Array,
    num_items: int | None = None,
    interpret: bool = False,
):
    """Returns (scores [B, V] f32 phantom-masked, maxes_t [V/CHUNK, B] f32)."""
    B, dim = session_embeddings.shape
    V = item_embeddings.shape[0]
    assert supports(B, V, dim), (B, V)
    valid = V if num_items is None else min(num_items, V)

    grid = (B // TILE_B, V // TILE_V)
    kernel = functools.partial(_kernel, valid, dim)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_V, dim), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_B, TILE_V), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TILE_V // CHUNK, TILE_B), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, V), jnp.float32),
            jax.ShapeDtypeStruct((V // CHUNK, B), jnp.float32),
        ],
        interpret=interpret,
    )(session_embeddings, item_embeddings)


def fused_two_level_topk(
    session_embeddings: jax.Array,
    item_embeddings: jax.Array,
    k: int,
    num_items: int | None = None,
    interpret: bool = False,
):
    """Exact top-k with the fused phase 1. Same results as
    scoring.two_level_topk(chunk=32); callers gate on supports()."""
    B = session_embeddings.shape[0]
    V = item_embeddings.shape[0]
    NC = V // CHUNK
    scores, maxes_t = fused_score_chunkmax(
        session_embeddings, item_embeddings, num_items, interpret=interpret
    )
    _, top_chunks = jax.lax.top_k(maxes_t.T, k)  # [B, k]
    chunked = scores.reshape(B, NC, CHUNK)
    cand = jnp.take_along_axis(chunked, top_chunks[:, :, None], axis=1)
    cand = cand.reshape(B, k * CHUNK)
    base = top_chunks[:, :, None] * CHUNK + jnp.arange(CHUNK, dtype=jnp.int32)
    base = base.reshape(B, k * CHUNK)
    s, pos = jax.lax.top_k(cand, k)
    return s, jnp.take_along_axis(base, pos, axis=1).astype(jnp.int32)
