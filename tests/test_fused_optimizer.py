"""Fused embedding-AdamW: exact equivalence with optax.adamw over the full tree."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gat_recommendation_tpu.data.batching import to_device
from gat_recommendation_tpu.models import create_model
from gat_recommendation_tpu.ops.pallas.embedding_adamw import (
    adamw_update_reference,
    fused_embedding_adamw,
)
from gat_recommendation_tpu.train.losses import dual_loss
from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW
from gat_recommendation_tpu.train.trainer import make_train_step

from tests.conftest import make_dummy_batch


def test_reference_matches_optax_multi_step():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((40, 8)).astype(np.float32))
    mu = jnp.zeros_like(w)
    nu = jnp.zeros_like(w)
    params = {"w": w}
    opt = optax.adamw(1e-3, weight_decay=1e-5)
    ost = opt.init(params)
    count = jnp.zeros((), jnp.int32)
    for step in range(5):
        g = jnp.asarray(rng.standard_normal((40, 8)).astype(np.float32))
        upd, ost = opt.update({"w": g}, ost, params)
        params = optax.apply_updates(params, upd)
        count = count + 1
        w, mu, nu = adamw_update_reference(w, mu, nu, g, count, lr=1e-3, weight_decay=1e-5)
        np.testing.assert_allclose(np.asarray(w), np.asarray(params["w"]), rtol=1e-6, atol=1e-7)


def test_pallas_interpret_matches_reference():
    rng = np.random.default_rng(1)
    V, D = 300, 16  # non-multiple of the row tile
    w = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    mu = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32) * 0.01)
    nu = jnp.asarray(np.abs(rng.standard_normal((V, D))).astype(np.float32) * 1e-3)
    g = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    count = jnp.asarray(7, jnp.int32)
    ref = adamw_update_reference(w, mu, nu, g, count, lr=3e-4, weight_decay=1e-4)
    out = fused_embedding_adamw(
        w, mu, nu, g, count, lr=3e-4, weight_decay=1e-4, row_tile=128, interpret=True
    )
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("model_name", ["graphsage", "graph_transformer_optimized"])
def test_fused_train_step_matches_optax(model_name):
    """Whole train step: FusedEmbeddingAdamW == optax.adamw, bit-for-bit-ish."""
    kwargs = dict(embedding_dim=16, hidden_dim=16, dropout=0.0)
    if model_name == "graph_transformer_optimized":
        kwargs["laplacian_k"] = 4
    model = create_model(model_name, num_items=100, **kwargs)
    params, state = model.init_params(jax.random.key(0))
    if model.uses_laplacian_pe:
        state = model.precompute_pe(state, np.arange(1, 30), np.arange(2, 31))
    batch = to_device(make_dummy_batch())
    rng = jax.random.key(5)

    opt_a = optax.adamw(1e-3, weight_decay=1e-5)
    step_a = make_train_step(model, dual_loss, opt_a)
    pa, sa, oa = params, state, opt_a.init(params)

    opt_b = FusedEmbeddingAdamW(1e-3, weight_decay=1e-5, use_pallas=False)
    step_b = make_train_step(model, dual_loss, opt_b)
    pb, sb, ob = params, state, opt_b.init(params)

    for i in range(3):
        r = jax.random.fold_in(rng, i)
        pa, sa, oa, loss_a = step_a(pa, sa, oa, batch, r)
        pb, sb, ob, loss_b = step_b(pb, sb, ob, batch, r)
        np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)

    for leaf_a, leaf_b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_allclose(
            np.asarray(leaf_a), np.asarray(leaf_b), rtol=1e-5, atol=1e-7
        )


def test_padding_row_stays_zero():
    model = create_model("graphsage", num_items=50, embedding_dim=8, hidden_dim=8)
    params, state = model.init_params(jax.random.key(0))
    opt = FusedEmbeddingAdamW(1e-2, weight_decay=1e-2, use_pallas=False)
    step = make_train_step(model, dual_loss, opt)
    ost = opt.init(params)
    batch = to_device(make_dummy_batch())
    for i in range(3):
        params, state, ost, _ = step(params, state, ost, batch, jax.random.key(i))
    assert float(jnp.abs(params["item_embedding"][0]).sum()) == 0.0
