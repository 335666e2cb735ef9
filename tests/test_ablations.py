"""Ablation-matrix smoke tests (parity with reference tests/test_ablations.py).

Parametrized 1-step training for all models, FFN on/off, all readouts, all
losses, and model x loss end-to-end combos.
"""

import jax
import numpy as np
import optax
import pytest

from gat_recommendation_tpu.data.batching import to_device
from gat_recommendation_tpu.models import create_model
from gat_recommendation_tpu.train.losses import create_loss_function
from gat_recommendation_tpu.train.trainer import make_train_step

from tests.conftest import make_dummy_batch

NUM_ITEMS = 100


def build(name, **kw):
    kwargs = dict(embedding_dim=16, hidden_dim=16)
    if name.startswith("graph_transformer"):
        kwargs["laplacian_k"] = 4
    kwargs.update(kw)
    return create_model(name, NUM_ITEMS, **kwargs)


def one_step(model, loss_fn):
    params, state = model.init_params(jax.random.key(0))
    if model.uses_laplacian_pe:
        state = model.precompute_pe(state, np.arange(1, 30), np.arange(2, 31))
    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(model, loss_fn, optimizer)
    batch = to_device(make_dummy_batch())
    params, state, opt_state, loss = step(params, state, opt_state, batch, jax.random.key(1))
    return float(loss)


@pytest.mark.parametrize(
    "name", ["graphsage", "gat", "graph_transformer", "graph_transformer_optimized"]
)
def test_one_step_all_models(name):
    loss = one_step(build(name), create_loss_function("dual"))
    assert np.isfinite(loss)


@pytest.mark.parametrize("use_ffn", [True, False])
def test_ffn_ablation(use_ffn):
    model = build("graph_transformer", num_heads=2, use_ffn=use_ffn, ffn_expansion=2)
    assert np.isfinite(one_step(model, create_loss_function("listwise")))


@pytest.mark.parametrize("readout", ["mean", "max", "last", "attention"])
def test_readout_ablation(readout):
    model = build("graphsage", readout_type=readout)
    assert np.isfinite(one_step(model, create_loss_function("bpr")))


@pytest.mark.parametrize("loss_type", ["bpr", "listwise", "dual", "sampled_softmax"])
def test_loss_ablation(loss_type):
    model = build("graphsage")
    assert np.isfinite(one_step(model, create_loss_function(loss_type)))


@pytest.mark.parametrize(
    "name,loss_type",
    [
        ("graphsage", "bpr"),
        ("gat", "listwise"),
        ("graph_transformer", "dual"),
        ("graph_transformer_optimized", "dual"),
    ],
)
def test_model_loss_combos_end_to_end(name, loss_type):
    """2 steps: loss must stay finite and change (training is happening)."""
    model = build(name)
    params, state = model.init_params(jax.random.key(0))
    if model.uses_laplacian_pe:
        state = model.precompute_pe(state, np.arange(1, 30), np.arange(2, 31))
    optimizer = optax.adamw(1e-2)
    opt_state = optimizer.init(params)
    step = make_train_step(model, create_loss_function(loss_type), optimizer)
    batch = to_device(make_dummy_batch())
    losses = []
    for i in range(2):
        params, state, opt_state, loss = step(params, state, opt_state, batch, jax.random.key(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[0] != losses[1]


@pytest.mark.parametrize("aggregator", ["mean", "max", "lstm"])
def test_sage_aggregator_ablation(aggregator):
    model = build("graphsage", aggregator=aggregator)
    assert np.isfinite(one_step(model, create_loss_function("dual")))


def test_no_laplacian_pe_ablation():
    model = build("graph_transformer_optimized", use_laplacian_pe=False)
    assert np.isfinite(one_step(model, create_loss_function("dual")))
