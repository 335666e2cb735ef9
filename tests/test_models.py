"""Model tests: shapes/NaN/grad-flow per model + factory defaults + readouts.

Mirrors reference tests/test_models.py coverage; golden math parity for the
conv layers lives in tests/test_layers_golden.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gat_recommendation_tpu.data.batching import to_device
from gat_recommendation_tpu.models import create_model, predict_topk
from gat_recommendation_tpu.models.registry import MODEL_NAMES, count_params

MODELS = list(MODEL_NAMES)


def build(name, small_model_config, **kw):
    cfg = dict(small_model_config)
    cfg.update(kw)
    num_items = cfg.pop("num_items")
    if name in ("graph_transformer", "graph_transformer_optimized"):
        cfg.setdefault("laplacian_k", 4)
    if name == "gat":
        cfg.setdefault("num_heads", 2)
    return create_model(name, num_items, **cfg)


@pytest.mark.parametrize("name", MODELS)
def test_forward_shape_and_finite(name, small_model_config, dummy_batch):
    model = build(name, small_model_config)
    params, state = model.init_params(jax.random.key(0))
    if model.uses_laplacian_pe:
        state = model.precompute_pe(state, np.array([1, 2, 5]), np.array([2, 3, 6]))
    batch = to_device(dummy_batch)
    sess, new_state = model(params, state, batch, train=False)
    assert sess.shape == (2, small_model_config["hidden_dim"])
    assert bool(jnp.isfinite(sess).all())


@pytest.mark.parametrize("name", MODELS)
def test_gradients_flow_to_embedding(name, small_model_config, dummy_batch):
    model = build(name, small_model_config)
    params, state = model.init_params(jax.random.key(0))
    if model.uses_laplacian_pe:
        state = model.precompute_pe(state, np.array([1, 2, 5]), np.array([2, 3, 6]))
    batch = to_device(dummy_batch)

    def loss_fn(p):
        sess, _ = model(p, state, batch, train=True, rng=jax.random.key(1))
        return jnp.sum(sess**2)

    grads = jax.grad(loss_fn)(params)
    g = grads["item_embedding"]
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0.0
    # Padding row gradient only comes from padded node slots; valid ids 1..9
    # must receive gradient.
    assert float(jnp.abs(g[1:10]).sum()) > 0.0


def test_optimized_factory_defaults():
    model = create_model("graph_transformer_optimized", num_items=50)
    cfg = model.config
    assert cfg.use_ffn is False
    assert cfg.num_layers == 2
    assert cfg.num_heads == 2
    assert cfg.ffn_expansion == 2


def test_standard_vs_optimized_param_count(small_model_config):
    std = build("graph_transformer", small_model_config, num_heads=2, use_ffn=True)
    opt = build("graph_transformer_optimized", small_model_config, num_heads=2)
    p_std, _ = std.init_params(jax.random.key(0))
    p_opt, _ = opt.init_params(jax.random.key(0))
    assert count_params(p_std) > count_params(p_opt)


@pytest.mark.parametrize("readout", ["mean", "max", "last", "attention"])
def test_readout_types(readout, small_model_config, dummy_batch):
    model = build("graphsage", small_model_config, readout_type=readout)
    params, state = model.init_params(jax.random.key(0))
    sess, _ = model(params, state, to_device(dummy_batch), train=False)
    assert sess.shape == (2, small_model_config["hidden_dim"])
    assert bool(jnp.isfinite(sess).all())


def test_readout_semantics():
    from gat_recommendation_tpu.models.base import apply_readout

    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 6, 4))
    mask = jnp.asarray(np.array([[True, True, True, False, False, False]]))
    num_nodes = jnp.asarray([3])
    mean = apply_readout({}, x, mask, num_nodes, "mean")
    np.testing.assert_allclose(np.asarray(mean)[0], x[0, :3].mean(axis=0), rtol=1e-6)
    mx = apply_readout({}, x, mask, num_nodes, "max")
    np.testing.assert_allclose(np.asarray(mx)[0], np.asarray(x[0, 2]), rtol=1e-6)
    last = apply_readout({}, x, mask, num_nodes, "last")
    np.testing.assert_allclose(np.asarray(last)[0], np.asarray(x[0, 2]), rtol=1e-6)


def test_predict_topk():
    sess = jnp.asarray(np.eye(3, 8, dtype=np.float32))
    items = jnp.asarray(np.eye(8, dtype=np.float32))
    idx, scores = predict_topk(sess, items, k=2)
    assert idx.shape == (3, 2)
    assert idx[0, 0] == 0 and idx[1, 0] == 1 and idx[2, 0] == 2


def test_embedding_padding_row_zero(small_model_config):
    model = build("graphsage", small_model_config)
    params, _ = model.init_params(jax.random.key(0))
    assert float(jnp.abs(params["item_embedding"][0]).sum()) == 0.0


def test_gat_concat_heads(small_model_config, dummy_batch):
    model = build("gat", small_model_config, concat_heads=True, num_heads=2)
    params, state = model.init_params(jax.random.key(0))
    sess, _ = model(params, state, to_device(dummy_batch), train=False)
    assert sess.shape == (2, small_model_config["hidden_dim"])


def test_dropout_train_vs_eval(small_model_config, dummy_batch):
    model = build("graphsage", small_model_config, dropout=0.5)
    params, state = model.init_params(jax.random.key(0))
    batch = to_device(dummy_batch)
    eval_out, _ = model(params, state, batch, train=False)
    eval_out2, _ = model(params, state, batch, train=False)
    np.testing.assert_allclose(np.asarray(eval_out), np.asarray(eval_out2))
    train_out, _ = model(params, state, batch, train=True, rng=jax.random.key(3))
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))


def test_laplacian_pe_path_graph():
    """LapPE math on a 4-node path graph (reference tests/test_models.py:229-277 style)."""
    from gat_recommendation_tpu.models.laplacian_pe import compute_laplacian_pe

    item_i = np.array([0, 1, 2])
    item_j = np.array([1, 2, 3])
    pe = compute_laplacian_pe(item_i, item_j, num_nodes=6, k=2)
    assert pe.shape == (6, 2)
    assert np.isfinite(pe).all()
    assert (pe >= 0).all()  # abs() sign invariance
    assert np.abs(pe[:4]).sum() > 0
    np.testing.assert_allclose(pe[4:], 0.0)  # isolated ids get zero PE
