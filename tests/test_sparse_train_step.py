"""Sparse-gradient train step: exact equivalence with the dense optax step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gat_recommendation_tpu.data.batching import to_device
from gat_recommendation_tpu.models import create_model
from gat_recommendation_tpu.train.losses import create_loss_function
from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW
from gat_recommendation_tpu.train.trainer import make_sparse_train_step, make_train_step

from tests.conftest import make_dummy_batch


@pytest.mark.parametrize("model_name", ["graphsage", "gat", "graph_transformer_optimized"])
@pytest.mark.parametrize("loss_type", ["dual", "bpr"])
def test_sparse_step_matches_dense(model_name, loss_type):
    kwargs = dict(embedding_dim=16, hidden_dim=16, dropout=0.0)
    if model_name == "graph_transformer_optimized":
        kwargs["laplacian_k"] = 4
    if model_name == "gat":
        kwargs["num_heads"] = 2
    model = create_model(model_name, num_items=100, **kwargs)
    params, state = model.init_params(jax.random.key(0))
    if model.uses_laplacian_pe:
        state = model.precompute_pe(state, np.arange(1, 30), np.arange(2, 31))
    batch = to_device(make_dummy_batch())
    loss_fn = create_loss_function(loss_type)

    # Dense reference: plain optax adamw.
    opt_a = optax.adamw(1e-3, weight_decay=1e-5)
    step_a = make_train_step(model, loss_fn, opt_a)
    pa, sa, oa = params, state, opt_a.init(params)

    # Sparse path.
    opt_b = FusedEmbeddingAdamW(1e-3, weight_decay=1e-5, use_pallas=False)
    step_b = make_sparse_train_step(model, loss_fn, opt_b)
    pb, sb, ob = params, state, opt_b.init(params)

    # One step: must match essentially exactly (same math, same grads).
    r = jax.random.key(10)
    pa, sa, oa, loss_a = step_a(pa, sa, oa, batch, r)
    pb, sb, ob, loss_b = step_b(pb, sb, ob, batch, r)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    for la, lb in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-5, atol=1e-6)
    for la, lb in zip(jax.tree.leaves(sa), jax.tree.leaves(sb)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-5, atol=1e-6)

    # Multi-step: Adam normalizes near-zero gradients to ±lr, so float
    # associativity noise (≈1e-8) amplifies chaotically in individual bias
    # params — compare the LOSS trajectory, which stays tight.
    for i in range(1, 4):
        r = jax.random.key(10 + i)
        pa, sa, oa, loss_a = step_a(pa, sa, oa, batch, r)
        pb, sb, ob, loss_b = step_b(pb, sb, ob, batch, r)
        np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(pa["item_embedding"]), np.asarray(pb["item_embedding"]),
        rtol=1e-3, atol=1e-5,
    )


def test_sparse_step_padding_row_stays_zero():
    model = create_model("graphsage", num_items=80, embedding_dim=8, hidden_dim=8)
    params, state = model.init_params(jax.random.key(0))
    opt = FusedEmbeddingAdamW(1e-2, weight_decay=1e-2, use_pallas=False)
    step = make_sparse_train_step(model, create_loss_function("dual"), opt)
    ost = opt.init(params)
    batch = to_device(make_dummy_batch())
    for i in range(3):
        params, state, ost, _ = step(params, state, ost, batch, jax.random.key(i))
    assert float(jnp.abs(params["item_embedding"][0]).sum()) == 0.0


def test_chained_step_matches_unchained(tmp_path):
    """The lax.scan-chained step (C updates per dispatch) is the SAME
    program as the unchained loop: identical RNG stream, identical loss
    trajectory and metrics (docs/PERFORMANCE.md 'Step chaining')."""
    import pandas as pd

    from gat_recommendation_tpu.data.batching import SessionDataset, iterate_batches
    from gat_recommendation_tpu.train.trainer import Trainer

    rng = np.random.default_rng(4)
    rows = []
    # 200 sessions -> ~25 batches at B=8: bucket runs long enough that
    # chain=12 forms full groups AND >=8 partial runs (the sub-chain path).
    for s in range(200):
        for t in range(int(rng.integers(3, 12))):
            rows.append((f"s{s:03d}", t * 1000, int(rng.integers(1, 60))))
    df = pd.DataFrame(rows, columns=["session_id", "timestamp", "itemid"])
    edges = (rng.integers(1, 60, 150), rng.integers(1, 60, 150))
    ds = SessionDataset(df, edges)

    results = {}
    # chain=4 < SUBCHAIN exercises the singles fallback; chain=12 leaves
    # partial groups >= 8 that run through the C=8 sub-chain path.
    for chain in (1, 4, 12):
        model = create_model("graphsage", num_items=ds.num_items,
                             embedding_dim=16, hidden_dim=16, dropout=0.0)
        trainer = Trainer(
            model,
            train_batches=lambda epoch: iterate_batches(ds, 8, shuffle=True, seed=epoch),
            val_batches=lambda: iterate_batches(ds, 8),
            output_dir=tmp_path / f"chain_{chain}",
            max_epochs=2, eval_every=1,
            sparse_embedding_grads=True,
            chain=chain,
        )
        results[chain] = trainer.train()
        if chain > 1:
            # both chained paths must actually fire (train + eval)
            assert trainer.chained_dispatches > 0
            assert trainer.chained_eval_dispatches > 0
    for c in (4, 12):
        np.testing.assert_allclose(
            results[1]["train_loss"], results[c]["train_loss"], rtol=1e-5
        )
        a, b = results[1]["val_metrics"][-1], results[c]["val_metrics"][-1]
        for key in a:
            np.testing.assert_allclose(a[key], b[key], atol=1e-9, err_msg=key)


def test_trainer_sparse_mode_matches_dense_metrics(tmp_path):
    """Trainer(sparse_embedding_grads=True) trains to the same result."""
    import pandas as pd

    from gat_recommendation_tpu.data.batching import SessionDataset, iterate_batches
    from gat_recommendation_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    rows = []
    for s in range(40):
        for t in range(int(rng.integers(3, 9))):
            rows.append((f"s{s:02d}", t * 1000, int(rng.integers(1, 50))))
    df = pd.DataFrame(rows, columns=["session_id", "timestamp", "itemid"])
    edges = (rng.integers(1, 50, 120), rng.integers(1, 50, 120))
    ds = SessionDataset(df, edges)

    results = {}
    for sparse in (False, True):
        model = create_model("graphsage", num_items=ds.num_items,
                             embedding_dim=16, hidden_dim=16, dropout=0.0)
        trainer = Trainer(
            model,
            train_batches=lambda epoch: iterate_batches(ds, 8, shuffle=True, seed=epoch),
            val_batches=lambda: iterate_batches(ds, 8),
            output_dir=tmp_path / f"sparse_{sparse}",
            max_epochs=2, eval_every=1,
            sparse_embedding_grads=sparse,
        )
        hist = trainer.train()
        results[sparse] = hist
    np.testing.assert_allclose(
        results[False]["train_loss"], results[True]["train_loss"], rtol=1e-4
    )
    # Adam normalizes near-zero grads to +-lr, so 1e-8 associativity noise
    # can flip a rank near the boundary; metrics agree to ~5e-3.
    a, b = results[False]["val_metrics"][-1], results[True]["val_metrics"][-1]
    for key in a:
        np.testing.assert_allclose(a[key], b[key], atol=5e-3, err_msg=key)


def test_mixed_chain_group_fails_loudly(tmp_path):
    """A chain group mixing (batch, meta) multi-host items with plain
    batches must raise, not silently build GradIndexes from LOCAL batches
    (ADVICE r4: that would train with wrong global sparse updates)."""
    import pandas as pd

    from gat_recommendation_tpu.data.batching import (
        GlobalBatchMeta,
        SessionDataset,
        iterate_batches,
    )
    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.train.trainer import Trainer

    rng = np.random.default_rng(2)
    rows = []
    for s in range(20):
        for t in range(int(rng.integers(3, 8))):
            rows.append((f"s{s:02d}", t * 1000, int(rng.integers(1, 40))))
    df = pd.DataFrame(rows, columns=["session_id", "timestamp", "itemid"])
    ds = SessionDataset(df, (rng.integers(1, 40, 60), rng.integers(1, 40, 60)))
    model = create_model("graphsage", num_items=ds.num_items, embedding_dim=8, hidden_dim=8)
    trainer = Trainer(
        model,
        train_batches=lambda e: iterate_batches(ds, 8),
        val_batches=lambda: iterate_batches(ds, 8),
        output_dir=tmp_path,
        sparse_embedding_grads=True,
        chain=2,
    )
    batches = list(iterate_batches(ds, 8))[:2]
    meta = GlobalBatchMeta(
        targets=np.asarray(batches[0].targets),
        sample_mask=np.asarray(batches[0].sample_mask),
        ids=np.arange(10, dtype=np.int32),
    )
    mixed = [(batches[0], meta), batches[1]]
    with pytest.raises(AssertionError, match="homogeneous"):
        trainer._transfer_chain(mixed)
