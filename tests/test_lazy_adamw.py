"""Lazy catch-up AdamW (ops/lazy_adamw.py): equivalence with dense AdamW.

The lazy path updates only touched rows per step and reconstructs untouched
rows' decay + momentum tail at their next touch. These tests pin that the
reconstruction matches literally stepping dense AdamW with zero gradients
(the reference trajectory — torch.optim.AdamW over nn.Embedding updates
every row every step, /root/reference/etpgt/train/trainer.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gat_recommendation_tpu.data.batching import to_device
from gat_recommendation_tpu.models import create_model
from gat_recommendation_tpu.ops import lazy_adamw as la
from gat_recommendation_tpu.train.losses import create_loss_function
from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW
from gat_recommendation_tpu.train.trainer import make_sparse_train_step

from tests.conftest import make_dummy_batch

HP = dict(lr=1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-5)


def _other_batch(num_negatives: int = 5, bucket_n: int = 8):
    """A batch over a DIFFERENT item set than make_dummy_batch, so the
    touched-row set changes between steps and catch-up gaps actually form."""
    from gat_recommendation_tpu.data.batching import collate

    rng = np.random.default_rng(9)
    samples = [
        {
            "nodes": np.array([10, 11, 12], dtype=np.int32),
            "edge_src": np.array([0, 1, 1, 2], dtype=np.int32),
            "edge_dst": np.array([1, 0, 2, 1], dtype=np.int32),
            "target": 13,
            "negatives": rng.integers(1, 100, num_negatives).astype(np.int32),
        },
        {
            "nodes": np.array([20, 21], dtype=np.int32),
            "edge_src": np.array([0, 1], dtype=np.int32),
            "edge_dst": np.array([1, 0], dtype=np.int32),
            "target": 22,
            "negatives": rng.integers(1, 100, num_negatives).astype(np.int32),
        },
    ]
    return collate(samples, bucket_n, num_negatives)


def _random_rows(rng, n, d):
    w = rng.normal(0, 0.05, (n, d)).astype(np.float32)
    mu = rng.normal(0, 0.01, (n, d)).astype(np.float32)
    nu = (rng.gamma(2.0, 5e-5, (n, d))).astype(np.float32)  # realistic tiny nu
    return jnp.asarray(w), jnp.asarray(mu), jnp.asarray(nu)


def _stepped_oracle(w, mu, nu, ls, m, hp):
    """Literally run m zero-gradient dense AdamW steps per row."""
    w, mu, nu = np.asarray(w).copy(), np.asarray(mu).copy(), np.asarray(nu).copy()
    for i in range(len(w)):
        for j in range(1, int(m[i]) + 1):
            wi, mui, nui = la.dense_reference_step(
                jnp.asarray(w[i]), jnp.asarray(mu[i]), jnp.asarray(nu[i]),
                jnp.zeros_like(jnp.asarray(w[i])), int(ls[i]) + j, **hp,
            )
            w[i], mu[i], nu[i] = np.asarray(wi), np.asarray(mui), np.asarray(nui)
    return w, mu, nu


def test_catch_up_matches_stepped_zero_grad_adamw():
    rng = np.random.default_rng(0)
    w, mu, nu = _random_rows(rng, 6, 5)
    ls = np.array([0, 1, 3, 10, 40, 7], np.int32)
    m = np.array([0, 1, 2, 5, 20, 63], np.int32)  # all within TAIL_TERMS
    w_c, mu_c, nu_c = la.catch_up(w, mu, nu, jnp.asarray(ls), jnp.asarray(m), **HP)
    w_o, mu_o, nu_o = _stepped_oracle(w, mu, nu, ls, m, HP)
    np.testing.assert_allclose(np.asarray(w_c), w_o, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(mu_c), mu_o, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(nu_c), nu_o, rtol=1e-5, atol=1e-12)


def test_tail_truncation_error_is_bounded():
    """m >> TAIL_TERMS: the dropped series remainder must stay ~1e-5 of the
    weight scale (the b1^j envelope argument in the module docstring)."""
    rng = np.random.default_rng(1)
    w, mu, nu = _random_rows(rng, 4, 3)
    ls = np.full(4, 100, np.int32)
    m = np.array([100, 300, 1000, 5000], np.int32)
    w_c, _, _ = la.catch_up(w, mu, nu, jnp.asarray(ls), jnp.asarray(m), **HP)
    w_o, _, _ = _stepped_oracle(w, mu, nu, ls, m, HP)
    err = np.abs(np.asarray(w_c) - w_o).max()
    assert err < 5e-5, f"truncation error {err} exceeds bound"


def test_touched_update_matches_dense_reference():
    rng = np.random.default_rng(2)
    w, mu, nu = _random_rows(rng, 5, 4)
    g = jnp.asarray(rng.normal(0, 0.1, (5, 4)).astype(np.float32))
    count = jnp.asarray(17, jnp.int32)
    got = la.touched_update(w, mu, nu, g, count, **HP)
    want = la.dense_reference_step(w, mu, nu, g, 17, **HP)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_materialize_is_idempotent():
    rng = np.random.default_rng(3)
    w, mu, nu = _random_rows(rng, 8, 4)
    last = jnp.asarray(rng.integers(0, 20, 8).astype(np.int32))
    count = jnp.asarray(30, jnp.int32)
    once = la.materialize_arrays(w, mu, nu, last, count, **HP)
    twice = la.materialize_arrays(*once, count, **HP)
    for a, b in zip(once, twice):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


@pytest.mark.parametrize("model_name", ["graphsage", "graph_transformer_optimized"])
def test_lazy_step_matches_eager_sparse_step(model_name):
    """Full train-step equivalence: lazy (touched-rows-only) vs the eager
    sparse step (dense optimizer tail) over several steps, comparing the
    materialized table and the per-step losses (forwards must see identical
    weights — the catch-up happens at gather time)."""
    kwargs = dict(embedding_dim=16, hidden_dim=16, dropout=0.0)
    if model_name == "graph_transformer_optimized":
        kwargs["laplacian_k"] = 4
    model = create_model(model_name, num_items=100, **kwargs)
    params, state = model.init_params(jax.random.key(0))
    if model.uses_laplacian_pe:
        state = model.precompute_pe(state, np.arange(1, 30), np.arange(2, 31))
    loss_fn = create_loss_function("dual")
    # Two different batches so the touched-row set CHANGES between steps
    # (otherwise every row is always caught up and lazy never defers).
    batches = [to_device(make_dummy_batch()), to_device(_other_batch())]

    opt_e = FusedEmbeddingAdamW(1e-3, weight_decay=1e-5, use_pallas=False)
    step_e = make_sparse_train_step(model, loss_fn, opt_e)
    pe, se, oe = params, state, opt_e.init(params)

    opt_l = FusedEmbeddingAdamW(1e-3, weight_decay=1e-5, use_pallas=False, lazy=True)
    step_l = make_sparse_train_step(model, loss_fn, opt_l)
    pl, sl, ol = params, state, opt_l.init(params)

    for i in range(6):
        r = jax.random.key(100 + i)
        b = batches[i % 2]
        pe, se, oe, loss_e = step_e(pe, se, oe, b, r)
        pl, sl, ol, loss_l = step_l(pl, sl, ol, b, r)
        np.testing.assert_allclose(float(loss_e), float(loss_l), rtol=2e-4)

    pl, ol = opt_l.materialize(pl, ol)
    np.testing.assert_allclose(
        np.asarray(pe["item_embedding"]), np.asarray(pl["item_embedding"]),
        rtol=1e-3, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(oe["emb_mu"]), np.asarray(ol["emb_mu"]), rtol=1e-3, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(oe["emb_nu"]), np.asarray(ol["emb_nu"]), rtol=1e-3, atol=1e-10
    )
    assert bool((np.asarray(ol["last_step"]) <= 6).all())


def test_lazy_padding_row_stays_zero():
    model = create_model("graphsage", num_items=80, embedding_dim=8, hidden_dim=8)
    params, state = model.init_params(jax.random.key(0))
    opt = FusedEmbeddingAdamW(1e-2, weight_decay=1e-2, use_pallas=False, lazy=True)
    step = make_sparse_train_step(model, create_loss_function("dual"), opt)
    ost = opt.init(params)
    batch = to_device(make_dummy_batch())
    for i in range(3):
        params, state, ost, _ = step(params, state, ost, batch, jax.random.key(i))
    params, ost = opt.materialize(params, ost)
    assert float(jnp.abs(params["item_embedding"][0]).sum()) == 0.0


def test_lazy_resume_matches_uninterrupted(tmp_path):
    """Checkpoint/resume round-trip under lazy: train 2 epochs, resume from
    checkpoint_latest, train 2 more — the loss trajectory must match a
    4-epoch uninterrupted lazy run (last_step is saved MATERIALIZED, so
    resumed catch-up ages stay aligned with the restored count)."""
    import pandas as pd

    from gat_recommendation_tpu.data.batching import SessionDataset, iterate_batches
    from gat_recommendation_tpu.train.trainer import Trainer

    rng = np.random.default_rng(8)
    rows = []
    for s in range(80):
        for t in range(int(rng.integers(3, 9))):
            rows.append((f"s{s:03d}", t * 1000, int(rng.integers(1, 50))))
    df = pd.DataFrame(rows, columns=["session_id", "timestamp", "itemid"])
    ds = SessionDataset(df, (rng.integers(1, 50, 120), rng.integers(1, 50, 120)))

    def make_trainer(out, max_epochs):
        model = create_model("graphsage", num_items=ds.num_items,
                             embedding_dim=16, hidden_dim=16, dropout=0.0)
        return Trainer(
            model,
            train_batches=lambda e: iterate_batches(ds, 8, shuffle=True, seed=e),
            val_batches=lambda: iterate_batches(ds, 8),
            optimizer=FusedEmbeddingAdamW(1e-3, weight_decay=1e-5,
                                          use_pallas=False, lazy=True),
            output_dir=out,
            max_epochs=max_epochs, eval_every=1,
            sparse_embedding_grads=True,
        )

    straight = make_trainer(tmp_path / "straight", 4).train()

    make_trainer(tmp_path / "resumed", 2).train()
    resumed = make_trainer(tmp_path / "resumed", 4).train(resume=True)

    np.testing.assert_allclose(
        straight["train_loss"], resumed["train_loss"], rtol=1e-4
    )
    a, b = straight["val_metrics"][-1], resumed["val_metrics"][-1]
    for key in a:
        np.testing.assert_allclose(a[key], b[key], atol=2 / 80 + 1e-9, err_msg=key)


def test_trainer_lazy_matches_eager_metrics(tmp_path):
    """Trainer-level: lazy + chained dispatch trains to the same metrics as
    the eager sparse path, and the saved checkpoints hold the MATERIALIZED
    table (evaluate_local on a lazy-trained checkpoint must be exact)."""
    import pandas as pd

    from gat_recommendation_tpu.data.batching import SessionDataset, iterate_batches
    from gat_recommendation_tpu.train import checkpoint
    from gat_recommendation_tpu.train.trainer import Trainer

    rng = np.random.default_rng(5)
    rows = []
    for s in range(120):
        for t in range(int(rng.integers(3, 10))):
            rows.append((f"s{s:03d}", t * 1000, int(rng.integers(1, 60))))
    df = pd.DataFrame(rows, columns=["session_id", "timestamp", "itemid"])
    edges = (rng.integers(1, 60, 150), rng.integers(1, 60, 150))
    ds = SessionDataset(df, edges)

    results, ckpts = {}, {}
    for mode in ("eager", "lazy"):
        model = create_model("graphsage", num_items=ds.num_items,
                             embedding_dim=16, hidden_dim=16, dropout=0.0)
        opt = FusedEmbeddingAdamW(1e-3, weight_decay=1e-5, use_pallas=False,
                                  lazy=(mode == "lazy"))
        trainer = Trainer(
            model,
            train_batches=lambda epoch: iterate_batches(ds, 8, shuffle=True, seed=epoch),
            val_batches=lambda: iterate_batches(ds, 8),
            optimizer=opt,
            output_dir=tmp_path / mode,
            max_epochs=2, eval_every=1,
            sparse_embedding_grads=True,
            chain=4,
        )
        results[mode] = trainer.train()
        ckpts[mode] = trainer.output_dir

    np.testing.assert_allclose(
        results["eager"]["train_loss"], results["lazy"]["train_loss"], rtol=1e-3
    )
    # Metrics quantize at 1/120 per session whose rank boundary flips on
    # ~1e-5 weight noise (tail truncation + summation order); allow two
    # flips. The tight invariants are the loss trajectory above and the
    # materialized-table comparison below.
    a, b = results["eager"]["val_metrics"][-1], results["lazy"]["val_metrics"][-1]
    for key in a:
        np.testing.assert_allclose(a[key], b[key], atol=2 / 120 + 1e-9, err_msg=key)

    # Checkpoint tables must agree WITHOUT the loader knowing about lazy:
    # the Trainer materialized before saving (restore_params_state is the
    # eval/serving consumers' path — no opt_state template at all).
    tmpl_model = create_model("graphsage", num_items=ds.num_items,
                              embedding_dim=16, hidden_dim=16, dropout=0.0)
    tmpl_p, tmpl_s = tmpl_model.init_params(jax.random.key(1))
    pe, _ = checkpoint.restore_params_state(
        ckpts["eager"] / "checkpoint_latest", tmpl_p, tmpl_s
    )
    pl, _ = checkpoint.restore_params_state(
        ckpts["lazy"] / "checkpoint_latest", tmpl_p, tmpl_s
    )
    np.testing.assert_allclose(
        np.asarray(pe["item_embedding"]), np.asarray(pl["item_embedding"]),
        rtol=1e-3, atol=2e-5,
    )
