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
    chained_batch_sharding,
    opt_state_shardings,
    param_shardings,
    replicated,
    state_shardings,
)


def make_sharded_train_step(model, loss_fn, optimizer, mesh, donate: bool = False) -> Callable:
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
                donate_argnums=(0, 1, 2) if donate else (),
            )
        return compiled["step"](params, state, opt_state, batch, rng)

    return sharded_step


def make_sharded_sparse_train_step(model, loss_fn, optimizer, mesh, donate: bool = False) -> Callable:
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
    from gat_recommendation_tpu.train.trainer import _sparse_step_body

    step = _sparse_step_body(model, loss_fn, optimizer, mesh=mesh)

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
                donate_argnums=(0, 1, 2) if donate else (),
            )
        return compiled["step"](params, state, opt_state, batch, gidx, rng)

    return sharded_step


def make_chained_sharded_sparse_train_step(model, loss_fn, optimizer, mesh, donate: bool = False) -> Callable:
    """Sharded sparse step that runs C optimizer steps in ONE dispatch.

    Mesh twin of trainer.make_chained_sparse_train_step: the stacked batch
    carries a leading chain axis [C, ...] with the BATCH axis (axis 1)
    sharded over 'data' and the chain axis unsharded; a lax.scan threads
    (params, state, opt_state) through the C sharded updates on-device.
    GSPMD slices the xs along the (replicated) chain axis, so every scan
    iteration is exactly the unchained sharded step — same collectives, same
    RNG stream fold_in(epoch_rng, step0 + i). This closes the same
    e2e/device-rate dispatch-latency gap on pods that single-device chaining
    closed on one chip (docs/PERFORMANCE.md 'Step chaining'); without it
    every multi-chip epoch pays per-dispatch latency batch-count times.
    """
    assert hasattr(optimizer, "update_sparse"), "optimizer must support update_sparse"
    from gat_recommendation_tpu.train.trainer import _sparse_step_body

    body = _sparse_step_body(model, loss_fn, optimizer, mesh=mesh)

    def chained(params, state, opt_state, batches, gidxs, epoch_rng, step0):
        def scan_body(carry, x):
            p, s, o = carry
            b, g, i = x
            p, s, o, loss = body(p, s, o, b, g, jax.random.fold_in(epoch_rng, step0 + i))
            return (p, s, o), loss

        C = gidxs.uid.shape[0]
        (params, state, opt_state), losses = jax.lax.scan(
            scan_body, (params, state, opt_state), (batches, gidxs, jnp.arange(C))
        )
        return params, state, opt_state, losses

    compiled = {}

    def sharded_chained(params, state, opt_state, batches, gidxs, epoch_rng, step0):
        if "step" not in compiled:
            ps = param_shardings(params, mesh)
            ss = state_shardings(state, mesh)
            os_ = opt_state_shardings(opt_state, ps, mesh)
            cbs = jax.tree.map(lambda _: chained_batch_sharding(mesh), batches)
            gs = jax.tree.map(lambda _: replicated(mesh), gidxs)
            compiled["step"] = jax.jit(
                chained,
                in_shardings=(
                    ps, ss, os_, cbs, gs, replicated(mesh), replicated(mesh),
                ),
                out_shardings=(ps, ss, os_, replicated(mesh)),
                donate_argnums=(0, 1, 2) if donate else (),
            )
        return compiled["step"](
            params, state, opt_state, batches, gidxs, epoch_rng, step0
        )

    return sharded_chained


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


def shard_chained_batch(batch, mesh):
    """Device-put a stacked [C, B, ...] chain-group batch onto the mesh
    (chain axis unsharded, batch axis over 'data'; adjacency bit-packed for
    the wire — packbits/dense_adj act on the last axis, rank-agnostic)."""
    from gat_recommendation_tpu.data.batching import SessionBatch, _worth_packing, pack_adj

    if isinstance(batch, SessionBatch) and _worth_packing(mesh.devices.flat[0]):
        batch = pack_adj(batch)
    cbs = chained_batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), cbs), batch)


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
