"""Vocab-sharded full-catalog scoring with two-phase distributed top-k.

The 466k-way scorer is the eval/serving throughput ceiling (SURVEY.md §7
hard part #5). Instead of letting GSPMD all-gather the full [B, V] score
matrix across 'model' shards, this shard_map computes each shard's local
scores, takes a LOCAL top-k, and all-gathers only k candidates per shard
(k * n_shards values instead of V) before the final merge — the classic
distributed top-k reduction, riding ICI.

Tie behavior matches jax.lax.top_k on the unsharded scores: candidates are
concatenated in ascending shard order, and lax.top_k is stable, so equal
scores resolve to the lowest global index either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def sharded_topk(
    session_emb: jax.Array, item_table: jax.Array, k: int, mesh, num_valid: int | None = None
) -> tuple:
    """Top-k over dot-product scores with the table sharded over 'model'.

    session_emb: [B, D] (replicated over 'model', sharded over 'data');
    item_table: [V, D] row-sharded over 'model'. Returns (indices [B, k],
    scores [B, k]) sharded over 'data'. Handles V not divisible by the
    model-axis size by padding with -inf-scoring phantom rows.
    """
    from gat_recommendation_tpu.ops.scoring import DEFAULT_CHUNK

    n_model = mesh.shape["model"]
    rows, D = item_table.shape
    # Logical catalog size: phantom rows beyond it (pre-padded tables and any
    # rows appended here for even sharding) are masked to -inf below.
    V = num_valid if num_valid is not None else rows
    # Pad so each shard's row count is ALSO a chunk multiple: the two-level
    # local selector would otherwise -inf-pad the [b, shard_rows] score
    # matrix per eval batch (a recurring ~30 MB copy at reference scale —
    # code-review r5); padding the table once here is free.
    pad = (-rows) % (n_model * DEFAULT_CHUNK)
    if pad:
        item_table = jnp.concatenate([item_table, jnp.zeros((pad, D), item_table.dtype)], 0)
    shard_rows = item_table.shape[0] // n_model

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("data", None), P("model", None)),
        out_specs=(P("data", None), P("data", None)),
        check_vma=False,
    )
    def _topk(sess_local, table_local):
        from gat_recommendation_tpu.ops.scoring import two_level_topk_scores

        scores = jnp.dot(
            sess_local, table_local.T, preferred_element_type=jnp.float32
        )  # [b, shard_rows]
        offset = jax.lax.axis_index("model") * shard_rows
        col_global = offset + jax.lax.broadcasted_iota(jnp.int32, (1, shard_rows), 1)
        scores = jnp.where(col_global < V, scores, -jnp.inf)  # phantom pad rows
        k_local = min(k, shard_rows)  # a shard can't contribute more rows than it holds
        # Shard-local phase via the exact two-level chunk-max selector:
        # shard rows are a CONTIGUOUS global index range, so its
        # lowest-local-index tie-break equals the lowest-global-index
        # tie-break the merge relies on. 3-4x over a dense lax.top_k sort
        # at 58k rows/shard (docs/PERFORMANCE.md "Eval scoring").
        local_vals, local_idx = two_level_topk_scores(scores, k_local)
        local_idx = local_idx + offset
        # Gather k candidates from every model shard: [b, mp*k].
        all_vals = jax.lax.all_gather(local_vals, "model", axis=1, tiled=True)
        all_idx = jax.lax.all_gather(local_idx, "model", axis=1, tiled=True)
        merged_vals, merged_pos = jax.lax.top_k(all_vals, k)
        merged_idx = jnp.take_along_axis(all_idx, merged_pos, axis=1)
        return merged_idx, merged_vals

    return _topk(session_emb, item_table)


def make_sharded_eval_step_v2(model, k: int, mesh):
    """Eval step using the explicit two-phase top-k (vs GSPMD's choice)."""

    def step(params, state, batch):
        sess, _ = model.apply(params, state, batch, model.config, train=False)
        idx, _ = sharded_topk(
            sess, params["item_embedding"], k, mesh, num_valid=model.config.num_items
        )
        return idx

    return jax.jit(step)
