"""Sharding tests on the 8-virtual-device CPU mesh (coverage the reference lacks)."""

import jax
import numpy as np
import optax
import pytest

from gat_recommendation_tpu.data.batching import collate
from gat_recommendation_tpu.models import create_model
from gat_recommendation_tpu.parallel import (
    make_mesh,
    make_sharded_eval_step,
    make_sharded_train_step,
)
from gat_recommendation_tpu.parallel.steps import shard_batch, shard_params
from gat_recommendation_tpu.train.losses import dual_loss
from gat_recommendation_tpu.train.trainer import make_train_step

from tests.conftest import make_dummy_batch


def make_batch8():
    """8-sample batch (divisible by the data axis)."""
    rng = np.random.default_rng(0)
    samples = []
    for _ in range(8):
        n = int(rng.integers(2, 6))
        nodes = np.sort(rng.choice(np.arange(1, 100), size=n, replace=False)).astype(np.int32)
        m = int(rng.integers(1, n * n))
        src = rng.integers(0, n, m).astype(np.int32)
        dst = rng.integers(0, n, m).astype(np.int32)
        samples.append(
            {
                "nodes": nodes,
                "edge_src": src,
                "edge_dst": dst,
                "target": int(rng.integers(1, 100)),
                "negatives": rng.integers(1, 100, 5).astype(np.int32),
            }
        )
    return collate(samples, 8, 5)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_mesh_shapes(shape):
    mesh = make_mesh(n_data=shape[0], n_model=shape[1])
    assert mesh.shape == {"data": shape[0], "model": shape[1]}


def test_embedding_row_sharded():
    from gat_recommendation_tpu.parallel.mesh import param_shardings

    mesh = make_mesh(n_data=4, n_model=2)
    model = create_model("graphsage", num_items=64, embedding_dim=16, hidden_dim=16)
    params, _ = model.init_params(jax.random.key(0))
    shardings = param_shardings(params, mesh)
    assert shardings["item_embedding"].spec == jax.sharding.PartitionSpec("model", None)
    assert shardings["convs"][0]["lin_l"]["w"].spec == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_train_step_matches_single_device(mesh_shape):
    """DP+TP sharded step must produce the same params as the single-device step."""
    model = create_model(
        "graph_transformer_optimized",
        num_items=104,
        embedding_dim=16,
        hidden_dim=16,
        laplacian_k=4,
        dropout=0.0,  # determinism across partitionings
    )
    params, state = model.init_params(jax.random.key(0))
    state = model.precompute_pe(state, np.arange(1, 40), np.arange(2, 41))
    optimizer = optax.adamw(1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    batch = make_batch8()
    rng = jax.random.key(7)

    # Single-device reference.
    single = make_train_step(model, dual_loss, optimizer)
    from gat_recommendation_tpu.data.batching import to_device

    p1, s1, o1, loss1 = single(params, state, opt_state, to_device(batch), rng)

    # Sharded.
    mesh = make_mesh(*mesh_shape)
    sp, ss, so = shard_params(params, state, opt_state, mesh)
    sharded = make_sharded_train_step(model, dual_loss, optimizer, mesh)
    p2, s2, o2, loss2 = sharded(sp, ss, so, shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1["item_embedding"]), np.asarray(p2["item_embedding"]), rtol=1e-4, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_sharded_eval_step_matches_single_device():
    model = create_model("graphsage", num_items=104, embedding_dim=16, hidden_dim=16)
    params, state = model.init_params(jax.random.key(1))
    batch = make_batch8()

    from gat_recommendation_tpu.data.batching import to_device
    from gat_recommendation_tpu.train.trainer import make_eval_step

    single = make_eval_step(model, 10)
    top1 = np.asarray(single(params, state, to_device(batch)))

    mesh = make_mesh(n_data=4, n_model=2)
    sp, ss, _ = shard_params(params, state, optax.adamw(1e-3).init(params), mesh)
    sharded = make_sharded_eval_step(model, 10, mesh)
    top2 = np.asarray(sharded(sp, ss, shard_batch(batch, mesh)))
    np.testing.assert_array_equal(top1, top2)


def test_multi_step_training_stays_finite():
    mesh = make_mesh(n_data=4, n_model=2)
    model = create_model("gat", num_items=104, embedding_dim=16, hidden_dim=16, num_heads=2)
    params, state = model.init_params(jax.random.key(0))
    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(params)
    sp, ss, so = shard_params(params, state, opt_state, mesh)
    step = make_sharded_train_step(model, dual_loss, optimizer, mesh)
    losses = []
    for i in range(4):
        batch = shard_batch(make_batch8(), mesh)
        sp, ss, so, loss = step(sp, ss, so, batch, jax.random.key(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_sparse_step_matches_single_device(mesh_shape):
    """Sparse-grad sharded step == single-device sparse step == dense step."""
    from gat_recommendation_tpu.parallel import make_sharded_sparse_train_step
    from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW
    from gat_recommendation_tpu.train.trainer import make_sparse_train_step

    model = create_model(
        "graph_transformer_optimized",
        num_items=104, embedding_dim=16, hidden_dim=16, laplacian_k=4, dropout=0.0,
    )
    params, state = model.init_params(jax.random.key(0))
    state = model.precompute_pe(state, np.arange(1, 40), np.arange(2, 41))
    batch = make_batch8()
    rng = jax.random.key(7)

    from gat_recommendation_tpu.data.batching import to_device

    opt_a = FusedEmbeddingAdamW(1e-3, weight_decay=1e-5, use_pallas=False)
    single = make_sparse_train_step(model, dual_loss, opt_a)
    p1, s1, o1, loss1 = single(params, state, opt_a.init(params), to_device(batch), rng)

    mesh = make_mesh(*mesh_shape)
    opt_b = FusedEmbeddingAdamW(1e-3, weight_decay=1e-5, use_pallas=False)
    sp, ss, so = shard_params(params, state, opt_b.init(params), mesh)
    sharded = make_sharded_sparse_train_step(model, dual_loss, opt_b, mesh)
    p2, s2, o2, loss2 = sharded(sp, ss, so, shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1["item_embedding"]), np.asarray(p2["item_embedding"]),
        rtol=1e-4, atol=1e-6,
    )
    # Moment buffers row-shard and still match.
    np.testing.assert_allclose(
        np.asarray(o1["emb_mu"]), np.asarray(o2["emb_mu"]), rtol=1e-4, atol=1e-7
    )


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_lazy_step_matches_single_device(mesh_shape):
    """Lazy catch-up AdamW under GSPMD: the same O(touched rows) body jits
    over the mesh (table/moments row-sharded, last_step replicated) and
    matches the single-device lazy step across steps with CHANGING touch
    sets (so cross-shard catch-up gathers actually happen), including after
    materialize()."""
    from gat_recommendation_tpu.parallel import make_sharded_sparse_train_step
    from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW
    from gat_recommendation_tpu.train.trainer import make_sparse_train_step

    model = create_model(
        "graph_transformer_optimized",
        num_items=104, embedding_dim=16, hidden_dim=16, laplacian_k=4, dropout=0.0,
    )
    params, state = model.init_params(jax.random.key(0))
    state = model.precompute_pe(state, np.arange(1, 40), np.arange(2, 41))
    from gat_recommendation_tpu.data.batching import to_device

    def other_batch8(seed):
        rng = np.random.default_rng(seed)
        samples = []
        for _ in range(8):
            n = int(rng.integers(2, 6))
            nodes = np.sort(
                rng.choice(np.arange(1, 104), size=n, replace=False)
            ).astype(np.int32)
            m = int(rng.integers(1, n * n))
            samples.append({
                "nodes": nodes,
                "edge_src": rng.integers(0, n, m).astype(np.int32),
                "edge_dst": rng.integers(0, n, m).astype(np.int32),
                "target": int(rng.integers(1, 104)),
                "negatives": rng.integers(1, 104, 5).astype(np.int32),
            })
        return collate(samples, 8, 5)

    batches = [make_batch8(), other_batch8(11), other_batch8(23)]

    opt_a = FusedEmbeddingAdamW(1e-3, weight_decay=1e-5, use_pallas=False, lazy=True)
    single = make_sparse_train_step(model, dual_loss, opt_a)
    p1, s1, o1 = params, state, opt_a.init(params)

    mesh = make_mesh(*mesh_shape)
    opt_b = FusedEmbeddingAdamW(1e-3, weight_decay=1e-5, use_pallas=False, lazy=True)
    p2, s2, o2 = shard_params(params, state, opt_b.init(params), mesh)
    sharded = make_sharded_sparse_train_step(model, dual_loss, opt_b, mesh)

    for i, b in enumerate(batches * 2):
        rng = jax.random.key(100 + i)
        p1, s1, o1, loss1 = single(p1, s1, o1, to_device(b), rng)
        p2, s2, o2, loss2 = sharded(p2, s2, o2, shard_batch(b, mesh), rng)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)

    p1, o1 = opt_a.materialize(p1, o1)
    p2, o2 = opt_b.materialize(p2, o2)
    np.testing.assert_allclose(
        np.asarray(p1["item_embedding"]), np.asarray(p2["item_embedding"]),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(o1["emb_mu"]), np.asarray(o2["emb_mu"]), rtol=1e-4, atol=1e-7
    )
    np.testing.assert_array_equal(
        np.asarray(o1["last_step"]), np.asarray(o2["last_step"])
    )


def test_fused_optimizer_moments_row_sharded():
    from gat_recommendation_tpu.parallel.mesh import opt_state_shardings, param_shardings
    from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW

    mesh = make_mesh(n_data=4, n_model=2)
    model = create_model("graphsage", num_items=64, embedding_dim=16, hidden_dim=16)
    params, _ = model.init_params(jax.random.key(0))
    opt = FusedEmbeddingAdamW(1e-3, use_pallas=False)
    shardings = opt_state_shardings(opt.init(params), param_shardings(params, mesh), mesh)
    assert shardings["emb_mu"].spec == jax.sharding.PartitionSpec("model", None)
    assert shardings["emb_nu"].spec == jax.sharding.PartitionSpec("model", None)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_chained_step_matches_unchained(tmp_path, mesh_shape):
    """Sharded lax.scan chaining (C updates per dispatch on the mesh) is the
    SAME program as the unchained sharded loop: identical RNG stream, loss
    trajectory and metrics — the mesh twin of
    test_sparse_train_step.test_chained_step_matches_unchained."""
    import pandas as pd

    from gat_recommendation_tpu.data.batching import SessionDataset, iterate_batches
    from gat_recommendation_tpu.train.trainer import Trainer

    rng = np.random.default_rng(11)
    rows = []
    for s in range(64):
        for t in range(int(rng.integers(3, 12))):
            rows.append((f"s{s:02d}", t * 1000, int(rng.integers(1, 60))))
    df = pd.DataFrame(rows, columns=["session_id", "timestamp", "itemid"])
    edges = (rng.integers(1, 60, 150), rng.integers(1, 60, 150))
    ds = SessionDataset(df, edges)

    results = {}
    for chain in (1, 4):
        mesh = make_mesh(*mesh_shape)
        model = create_model("graphsage", num_items=ds.num_items,
                             embedding_dim=16, hidden_dim=16, dropout=0.0)
        trainer = Trainer(
            model,
            train_batches=lambda epoch: iterate_batches(ds, 8, shuffle=True, seed=epoch),
            val_batches=lambda: iterate_batches(ds, 8),
            output_dir=tmp_path / f"chain_{chain}",
            max_epochs=2, eval_every=1,
            mesh=mesh,
            sparse_embedding_grads=True,
            chain=chain,
        )
        assert trainer.chain == chain  # mesh path must honor chaining now
        results[chain] = trainer.train()
    np.testing.assert_allclose(
        results[1]["train_loss"], results[4]["train_loss"], rtol=1e-5
    )
    a, b = results[1]["val_metrics"][-1], results[4]["val_metrics"][-1]
    for key in a:
        np.testing.assert_allclose(a[key], b[key], atol=1e-9, err_msg=key)
