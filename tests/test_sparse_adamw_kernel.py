"""Fused single-pass sparse AdamW kernel: equivalence with the XLA path.

Runs in interpret mode on the CPU test backend (same pattern as the other
Pallas kernel tests); the compiled path is exercised on TPU by bench.py and
the end-to-end drive.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gat_recommendation_tpu.data.batching import UID_SENTINEL
from gat_recommendation_tpu.ops.pallas.sparse_adamw import TILE, fused_sparse_adamw, supports

HP = dict(lr=1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-5)


def xla_reference(table, mu, nu, uid, summed, count):
    lr, b1, b2, eps, wd = HP["lr"], HP["b1"], HP["b2"], HP["eps"], HP["weight_decay"]
    mu = mu.at[uid].add((1 - b1) / b1 * summed, mode="drop")
    nu = nu.at[uid].add((1 - b2) / b2 * jnp.square(summed), mode="drop")
    mu, nu = b1 * mu, b2 * nu
    c = jnp.float32(count)
    new_table = table - lr * (
        (mu / (1 - b1**c)) / (jnp.sqrt(nu / (1 - b2**c)) + eps) + wd * table
    )
    return new_table, mu, nu


def make_inputs(rows=4 * TILE, dim=128, n_unique=37, pad_to=64, seed=0):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(rows, dim)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(rows, dim)) * 0.01, jnp.float32)
    nu = jnp.asarray(np.abs(rng.normal(size=(rows, dim))) * 0.001, jnp.float32)
    ids = np.sort(rng.choice(rows, n_unique, replace=False)).astype(np.int32)
    uid = np.full(pad_to, UID_SENTINEL, np.int32)
    uid[:n_unique] = ids
    summed = rng.normal(size=(pad_to, dim)).astype(np.float32)
    summed[n_unique:] = 0.0
    if ids[0] == 0:
        summed[0] = 0.0  # caller contract: padding row contributes nothing
    return table, mu, nu, jnp.asarray(uid), jnp.asarray(summed), 3


@pytest.mark.parametrize("seed", [0, 1])
def test_kernel_matches_xla(seed):
    args = make_inputs(seed=seed)
    want = xla_reference(*args)
    got = fused_sparse_adamw(*args, **HP, interpret=True)
    for w, g, name in zip(want, got, ["table", "mu", "nu"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-7,
                                   err_msg=name)


def test_kernel_all_slots_sentinel():
    table, mu, nu, _, summed, count = make_inputs()
    uid = jnp.full((64,), UID_SENTINEL, jnp.int32)
    got_t, got_m, got_n = fused_sparse_adamw(
        table, mu, nu, uid, jnp.zeros_like(summed), count, **HP, interpret=True
    )
    want = xla_reference(table, mu, nu, uid, jnp.zeros_like(summed), count)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want[1]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want[0]), rtol=1e-6)


def test_kernel_dense_uid_every_tile():
    # Touched rows spread across every tile, including tile boundaries.
    rows, dim = 4 * TILE, 128
    rng = np.random.default_rng(2)
    ids = np.unique(np.concatenate([
        np.arange(0, rows, TILE),          # first row of each tile
        np.arange(TILE - 1, rows, TILE),   # last row of each tile
        rng.choice(rows, 50, replace=False),
    ])).astype(np.int32)
    pad_to = 128
    uid = np.full(pad_to, UID_SENTINEL, np.int32)
    uid[: len(ids)] = ids
    table = jnp.asarray(rng.normal(size=(rows, dim)), jnp.float32)
    mu = jnp.zeros_like(table)
    nu = jnp.zeros_like(table)
    summed = rng.normal(size=(pad_to, dim)).astype(np.float32)
    summed[len(ids):] = 0.0
    summed[0] = 0.0  # ids[0] == 0
    want = xla_reference(table, mu, nu, jnp.asarray(uid), jnp.asarray(summed), 1)
    got = fused_sparse_adamw(table, mu, nu, jnp.asarray(uid), jnp.asarray(summed), 1,
                             **HP, interpret=True)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-7)


def test_supports_gate():
    assert supports(4 * TILE, 1024, 256)
    assert not supports(4 * TILE + 1, 1024, 256)   # rows not tile-divisible
    assert not supports(4 * TILE, 16384, 256)      # summed too big for VMEM
    assert supports(4 * TILE, 1024, 256, n_shards=2)
    assert not supports(4 * TILE, 1024, 256, n_shards=3)  # shard not tile-divisible


def test_row_offset_shard_equals_slice_of_global():
    """Kernel with row_offset on a table SLICE == same rows of the global
    update (the per-shard program sharded_fused_sparse_adamw runs)."""
    args = make_inputs(rows=4 * TILE, seed=5)
    table, mu, nu, uid, summed, count = args
    want = fused_sparse_adamw(*args, **HP, interpret=True)
    for shard in range(2):
        lo, hi = shard * 2 * TILE, (shard + 1) * 2 * TILE
        got = fused_sparse_adamw(
            table[lo:hi], mu[lo:hi], nu[lo:hi], uid, summed, count,
            **HP, row_offset=lo, interpret=True,
        )
        for w, g, name in zip(want, got, ["table", "mu", "nu"]):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w)[lo:hi], rtol=1e-6, atol=1e-7,
                err_msg=f"shard {shard} {name}",
            )


def test_sharded_kernel_on_mesh_matches_xla():
    """shard_mapped kernel on a (4,2) CPU mesh (interpret mode) == XLA path
    (VERDICT r1 next #4: the kernel's win must survive the mesh)."""
    from gat_recommendation_tpu.ops.pallas.sparse_adamw import sharded_fused_sparse_adamw
    from gat_recommendation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
    args = make_inputs(rows=4 * TILE, seed=6)
    table, mu, nu, uid, summed, count = args
    want = xla_reference(table, mu, nu, uid, summed, count)
    got = sharded_fused_sparse_adamw(
        table, mu, nu, uid, summed, jnp.asarray(count), mesh, **HP, interpret=True
    )
    for w, g, name in zip(want, got, ["table", "mu", "nu"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-6, atol=1e-7, err_msg=name
        )


def test_sharded_sparse_step_uses_pallas_kernel_on_mesh():
    """End-to-end: make_sharded_sparse_train_step with a use_pallas optimizer
    (interpret-mode kernel) matches the XLA-path step on the same mesh."""
    from gat_recommendation_tpu.data.batching import make_grad_index
    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.parallel.mesh import make_mesh
    from gat_recommendation_tpu.parallel.steps import (
        make_sharded_sparse_train_step,
        shard_batch,
        shard_params,
    )
    from gat_recommendation_tpu.train.losses import dual_loss
    from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW
    from gat_recommendation_tpu.ops.pallas import sparse_adamw as sk
    from tests.multihost_case import make_case

    mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
    ds, _, edges, num_items = make_case(num_sessions=40)
    from gat_recommendation_tpu.data.batching import iterate_batches

    batch = next(iter(iterate_batches(ds, 8, seed=0, engine="numpy")))
    model = create_model("graph_transformer_optimized", num_items,
                         embedding_dim=32, hidden_dim=32, laplacian_k=4)

    results = {}
    for name, use_pallas in [("xla", False), ("pallas", True)]:
        opt = FusedEmbeddingAdamW(1e-3, weight_decay=1e-5, use_pallas=use_pallas)
        if use_pallas:
            # interpret mode on the CPU test backend
            orig = sk.sharded_fused_sparse_adamw
            sk_patch = lambda *a, **k: orig(*a, **{**k, "interpret": True})  # noqa: E731
            sk.sharded_fused_sparse_adamw = sk_patch
        try:
            params, state = model.init_params(jax.random.key(0))
            params, state, opt_state = shard_params(params, state, opt.init(params), mesh)
            step = make_sharded_sparse_train_step(model, dual_loss, opt, mesh)
            p2, s2, o2, loss = step(
                params, state, opt_state,
                (shard_batch(batch, mesh), make_grad_index(batch)),
                jax.random.key(1),
            )
            results[name] = (np.asarray(p2["item_embedding"]), float(loss))
        finally:
            if use_pallas:
                sk.sharded_fused_sparse_adamw = orig
    np.testing.assert_allclose(results["pallas"][1], results["xla"][1], rtol=1e-6)
    np.testing.assert_allclose(
        results["pallas"][0], results["xla"][0], rtol=1e-5, atol=1e-7
    )


def test_bf16_moment_storage_close_to_f32():
    table, mu, nu, uid, summed, count = make_inputs(seed=3)
    want = fused_sparse_adamw(table, mu, nu, uid, summed, count, **HP, interpret=True)
    got = fused_sparse_adamw(
        table, mu.astype(jnp.bfloat16), nu.astype(jnp.bfloat16), uid, summed, count,
        **HP, interpret=True,
    )
    assert got[1].dtype == jnp.bfloat16 and got[2].dtype == jnp.bfloat16
    # Storage rounding only: tables agree to bf16 resolution of the moments.
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), rtol=2e-2, atol=2e-5
    )


def test_optimizer_moment_dtype_option():
    from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW

    params = {"item_embedding": jnp.ones((TILE, 8)), "w": jnp.ones((3,))}
    opt = FusedEmbeddingAdamW(1e-3, use_pallas=False, moment_dtype=jnp.bfloat16)
    state = opt.init(params)
    assert state["emb_mu"].dtype == jnp.bfloat16
    uid = jnp.array([1, 2], jnp.int32)
    summed = jnp.ones((2, 8), jnp.float32)
    new_params, new_state = opt.update_sparse({"w": jnp.ones((3,))}, uid, summed, state, params)
    assert new_state["emb_mu"].dtype == jnp.bfloat16
    assert new_params["item_embedding"].dtype == jnp.float32
