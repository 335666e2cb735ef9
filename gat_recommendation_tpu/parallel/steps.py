"""Sharded train/eval steps: jit over a mesh with NamedSharding annotations.

Same math as train/trainer.py's single-chip steps; XLA GSPMD partitions them:
grad all-reduce over 'data' (psum), embedding-row exchange over 'model'
(gather collectives), batch-norm statistics globally reduced (the cross-chip
sync the single-device reference gets for free on one GPU).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from gat_recommendation_tpu.parallel.mesh import (
    batch_sharding,
    opt_state_shardings,
    param_shardings,
    replicated,
    state_shardings,
)


def make_sharded_train_step(model, loss_fn, optimizer, mesh) -> Callable:
    """Jitted (params, state, opt_state, batch, rng) -> (params, state, opt_state, loss)."""

    def loss_and_state(params, state, batch, rng):
        sess, new_state = model.apply(params, state, batch, model.config, train=True, rng=rng)
        loss, _aux = loss_fn(
            sess, batch.targets, batch.negatives, params["item_embedding"], batch.sample_mask
        )
        return loss, new_state

    def step(params, state, opt_state, batch, rng):
        (loss, new_state), grads = jax.value_and_grad(loss_and_state, has_aux=True)(
            params, state, batch, rng
        )
        grads["item_embedding"] = grads["item_embedding"].at[0].set(0.0)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt_state, loss

    compiled = {}

    def sharded_step(params, state, opt_state, batch, rng):
        if "step" not in compiled:
            ps = param_shardings(params, mesh)
            ss = state_shardings(state, mesh)
            os_ = opt_state_shardings(opt_state, ps, mesh)
            bs = jax.tree.map(lambda _: batch_sharding(mesh), batch)
            compiled["step"] = jax.jit(
                step,
                in_shardings=(ps, ss, os_, bs, replicated(mesh)),
                out_shardings=(ps, ss, os_, replicated(mesh)),
            )
        return compiled["step"](params, state, opt_state, batch, rng)

    return sharded_step


def make_sharded_sparse_train_step(model, loss_fn, optimizer, mesh) -> Callable:
    """Sharded variant of trainer.make_sparse_train_step.

    Same math (sparse embedding gradients + scatter-first AdamW); GSPMD
    partitions the row-sharded table/moment scatters per shard. The
    GradIndex is replicated (it indexes the GLOBAL row space; the unique-id
    reduction is a whole-batch property). With use_pallas the optimizer runs
    the single-pass kernel shard_mapped over 'model' row shards
    (ops/pallas/sparse_adamw.sharded_fused_sparse_adamw) — each shard's
    searchsorted finds its own rows in the ascending uid, so the kernel's
    one-HBM-pass win survives sharding with zero added collectives.

    Accepts (batch, gidx) tuples or a bare SessionBatch like the
    single-device step.
    """
    assert hasattr(optimizer, "update_sparse"), "optimizer must support update_sparse"

    def step(params, state, opt_state, batch, gidx, rng):
        B, N = batch.node_ids.shape
        K = batch.negatives.shape[1]
        table = jax.lax.stop_gradient(params["item_embedding"])
        rows0 = table[gidx.ids]
        other = {k_: v for k_, v in params.items() if k_ != "item_embedding"}

        def loss_inner(other_params, rows):
            node_emb = rows[: B * N].reshape(B, N, -1)
            target_emb = rows[B * N : B * N + B]
            neg_emb = rows[B * N + B :].reshape(B, K, -1)
            full = {**other_params, "item_embedding": table}
            sess, new_state = model.apply(
                full, state, batch, model.config, train=True, rng=rng,
                node_embeddings=node_emb,
            )
            loss, _aux = loss_fn.from_embeddings(
                sess, target_emb, neg_emb, batch.sample_mask
            )
            return loss, new_state

        (loss, new_state), (g_other, g_rows) = jax.value_and_grad(
            loss_inner, argnums=(0, 1), has_aux=True
        )(other, rows0)
        summed = jax.ops.segment_sum(
            g_rows[gidx.perm], gidx.seg,
            num_segments=gidx.uid.shape[0], indices_are_sorted=True,
        )
        summed = jnp.where((gidx.uid == 0)[:, None], 0.0, summed)
        new_params, new_opt_state = optimizer.update_sparse(
            g_other, gidx.uid, summed, opt_state, params, mesh=mesh
        )
        return new_params, new_state, new_opt_state, loss

    compiled = {}

    def sharded_step(params, state, opt_state, batch, rng):
        if isinstance(batch, tuple):
            batch, gidx = batch
        else:
            from gat_recommendation_tpu.data.batching import make_grad_index

            gidx = make_grad_index(batch)
        if "step" not in compiled:
            ps = param_shardings(params, mesh)
            ss = state_shardings(state, mesh)
            os_ = opt_state_shardings(opt_state, ps, mesh)
            bs = jax.tree.map(lambda _: batch_sharding(mesh), batch)
            gs = jax.tree.map(lambda _: replicated(mesh), gidx)
            compiled["step"] = jax.jit(
                step,
                in_shardings=(ps, ss, os_, bs, gs, replicated(mesh)),
                out_shardings=(ps, ss, os_, replicated(mesh)),
            )
        return compiled["step"](params, state, opt_state, batch, gidx, rng)

    return sharded_step


def make_sharded_eval_step(model, k: int, mesh) -> Callable:
    """Jitted (params, state, batch) -> top-k ids; scorer sharded over vocab.

    The [B, V] score matrix is computed sharded (B over 'data', V over
    'model'); XLA lowers the top-k as per-shard top-k + cross-shard merge.
    """

    from gat_recommendation_tpu.models.base import mask_phantom

    def step(params, state, batch):
        sess, _ = model.apply(params, state, batch, model.config, train=False)
        scores = jnp.dot(sess, params["item_embedding"].T, preferred_element_type=jnp.float32)
        scores = mask_phantom(scores, model.config.num_items)
        _, top_idx = jax.lax.top_k(scores, k)
        return top_idx

    compiled = {}

    def sharded_step(params, state, batch):
        if "step" not in compiled:
            ps = param_shardings(params, mesh)
            ss = state_shardings(state, mesh)
            bs = jax.tree.map(lambda _: batch_sharding(mesh), batch)
            compiled["step"] = jax.jit(
                step,
                in_shardings=(ps, ss, bs),
                out_shardings=batch_sharding(mesh),
            )
        return compiled["step"](params, state, batch)

    return sharded_step


def shard_batch(batch, mesh):
    """Device-put a host SessionBatch onto the mesh, sharded over 'data'
    (adjacency bit-packed for the wire, like the single-device path)."""
    from gat_recommendation_tpu.data.batching import SessionBatch, _worth_packing, pack_adj

    if isinstance(batch, SessionBatch) and _worth_packing(mesh.devices.flat[0]):
        batch = pack_adj(batch)
    bs = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), bs), batch)


def shard_params(params, state, opt_state, mesh):
    """Place (params, state, opt_state) onto the mesh per the sharding rules."""
    ps = param_shardings(params, mesh)
    ss = state_shardings(state, mesh)
    os_ = opt_state_shardings(opt_state, ps, mesh)
    return (
        jax.tree.map(jax.device_put, params, ps),
        jax.tree.map(jax.device_put, state, ss),
        jax.tree.map(jax.device_put, opt_state, os_),
    )
