"""Two-phase sharded top-k vs dense lax.top_k on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gat_recommendation_tpu.parallel import make_mesh
from gat_recommendation_tpu.parallel.topk import sharded_topk


@pytest.mark.parametrize("V,k,mesh_shape", [(64, 5, (4, 2)), (100, 10, (2, 4)), (97, 7, (1, 8))])
def test_sharded_topk_matches_dense(V, k, mesh_shape):
    rng = np.random.default_rng(0)
    B, D = 8, 16
    sess = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    mesh = make_mesh(*mesh_shape)

    idx, vals = sharded_topk(sess, table, k, mesh)
    scores = np.asarray(sess) @ np.asarray(table).T
    ref_vals, ref_idx = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5)


def test_sharded_topk_with_ties():
    """Equal scores must resolve to the lowest index, like dense top_k."""
    mesh = make_mesh(1, 8)
    sess = jnp.ones((2, 4))
    table = jnp.ones((32, 4))  # every item scores identically
    idx, vals = sharded_topk(sess, table, 5, mesh)
    np.testing.assert_array_equal(np.asarray(idx), [[0, 1, 2, 3, 4]] * 2)


def test_sharded_eval_step_v2():
    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.parallel.topk import make_sharded_eval_step_v2
    from gat_recommendation_tpu.data.batching import to_device
    from gat_recommendation_tpu.train.trainer import make_eval_step

    from tests.test_parallel import make_batch8

    model = create_model("graphsage", num_items=104, embedding_dim=16, hidden_dim=16)
    params, state = model.init_params(jax.random.key(0))
    batch = to_device(make_batch8())

    dense = np.asarray(make_eval_step(model, 10)(params, state, batch))
    mesh = make_mesh(4, 2)
    v2 = np.asarray(make_sharded_eval_step_v2(model, 10, mesh)(params, state, batch))
    np.testing.assert_array_equal(dense, v2)


@pytest.mark.parametrize("V,k,mesh_shape", [(1000, 10, (1, 8)), (1224, 7, (2, 4))])
def test_sharded_topk_two_level_local_phase(V, k, mesh_shape, monkeypatch):
    """Shard-local phase through the two-level selector (VERDICT r4 next
    #8): shard rows here are NOT divisible by the 32-wide chunk, so the
    -inf column padding inside two_level_topk_scores is exercised, and
    integer scores force cross-shard ties — must still match dense."""
    from gat_recommendation_tpu.ops import scoring

    monkeypatch.setattr(scoring, "MIN_ROWS_FOR_TWO_LEVEL", 64)
    rng = np.random.default_rng(9)
    B, D = 6, 8
    sess = jnp.asarray(rng.integers(-2, 3, size=(B, D)), jnp.float32)
    table = jnp.asarray(rng.integers(-2, 3, size=(V, D)), jnp.float32)
    mesh = make_mesh(*mesh_shape)
    idx, vals = sharded_topk(sess, table, k, mesh)
    scores = jnp.asarray(np.asarray(sess) @ np.asarray(table).T)
    ref_vals, ref_idx = jax.lax.top_k(scores, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5)
