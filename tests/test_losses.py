"""Loss tests (parity with reference tests/test_losses.py coverage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gat_recommendation_tpu.train.losses import (
    bpr_loss,
    create_loss_function,
    dual_loss,
    listwise_loss,
)


@pytest.fixture
def loss_inputs():
    rng = np.random.default_rng(0)
    B, K, D, V = 4, 5, 16, 50
    sess = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    targets = jnp.asarray(rng.integers(1, V, B))
    negatives = jnp.asarray(rng.integers(1, V, (B, K)))
    return sess, targets, negatives, table


@pytest.mark.parametrize("loss_fn", [bpr_loss, listwise_loss, dual_loss])
def test_loss_scalar_finite(loss_fn, loss_inputs):
    loss, aux = loss_fn(*loss_inputs)
    assert loss.shape == ()
    assert bool(jnp.isfinite(loss))
    assert isinstance(aux, dict)


@pytest.mark.parametrize("name", ["bpr", "listwise", "dual", "sampled_softmax"])
def test_loss_gradients(name, loss_inputs):
    sess, targets, negatives, table = loss_inputs
    fn = create_loss_function(name)

    def f(s, t):
        loss, _ = fn(s, targets, negatives, t)
        return loss

    gs, gt = jax.grad(f, argnums=(0, 1))(sess, table)
    assert bool(jnp.isfinite(gs).all()) and bool(jnp.isfinite(gt).all())
    assert float(jnp.abs(gs).sum()) > 0


def test_temperature_changes_listwise(loss_inputs):
    sess, targets, negatives, table = loss_inputs
    l1, _ = listwise_loss(sess, targets, negatives, table, temperature=1.0)
    l2, _ = listwise_loss(sess, targets, negatives, table, temperature=0.1)
    assert not np.isclose(float(l1), float(l2))


def test_dual_alpha_weighting(loss_inputs):
    sess, targets, negatives, table = loss_inputs
    total, aux = dual_loss(sess, targets, negatives, table, alpha=0.7)
    np.testing.assert_allclose(
        float(total), 0.7 * float(aux["listwise"]) + 0.3 * float(aux["bpr"]), rtol=1e-6
    )
    t0, _ = dual_loss(sess, targets, negatives, table, alpha=0.0)
    np.testing.assert_allclose(float(t0), float(aux["bpr"]), rtol=1e-6)
    t1, _ = dual_loss(sess, targets, negatives, table, alpha=1.0)
    np.testing.assert_allclose(float(t1), float(aux["listwise"]), rtol=1e-6)


def test_sample_mask_excludes_padding(loss_inputs):
    sess, targets, negatives, table = loss_inputs
    full = jnp.asarray([True, True, True, True])
    half = jnp.asarray([True, True, False, False])
    l_half, _ = bpr_loss(sess, targets, negatives, table, half)
    l_sub, _ = bpr_loss(sess[:2], targets[:2], negatives[:2], table, full[:2])
    np.testing.assert_allclose(float(l_half), float(l_sub), rtol=1e-6)


def test_factory_invalid_type():
    with pytest.raises(ValueError):
        create_loss_function("nonsense")


def test_bpr_matches_reference_formula(loss_inputs):
    sess, targets, negatives, table = loss_inputs
    loss, _ = bpr_loss(sess, targets, negatives, table)
    pos = np.sum(np.asarray(sess) * np.asarray(table)[np.asarray(targets)], axis=1)
    neg = np.einsum("bkd,bd->bk", np.asarray(table)[np.asarray(negatives)], np.asarray(sess))
    expect = -np.log(1.0 / (1.0 + np.exp(-(pos[:, None] - neg))) + 1e-8).mean()
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)
