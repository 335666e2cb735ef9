"""Fused score+chunk-max kernel: correctness vs the dense oracle.

The kernel is a measured performance loser (see its module docstring) and
is not wired into any default path; these interpret-mode tests keep it
honest should Mosaic layout support improve.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gat_recommendation_tpu.ops import scoring
from gat_recommendation_tpu.ops.pallas.score_chunkmax import (
    CHUNK,
    TILE_B,
    TILE_V,
    fused_score_chunkmax,
    fused_two_level_topk,
    supports,
)


def make(B=TILE_B, V=4 * TILE_V, D=128, seed=0):
    rng = np.random.default_rng(seed)
    sess = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    return sess, table


def test_scores_and_maxes_match_oracle():
    sess, table = make()
    num_items = table.shape[0] - 100  # phantom tail
    scores, maxes_t = fused_score_chunkmax(sess, table, num_items, interpret=True)
    want = np.array(jnp.dot(sess, table.T))
    want[:, num_items:] = -np.inf
    np.testing.assert_allclose(np.asarray(scores), want, rtol=1e-5)
    want_m = want.reshape(want.shape[0], -1, CHUNK).max(-1).T
    np.testing.assert_allclose(np.asarray(maxes_t), want_m, rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 3])
def test_topk_matches_dense(seed):
    sess, table = make(seed=seed)
    want_s, want_i = scoring.dense_topk(sess, table, 10)
    got_s, got_i = fused_two_level_topk(sess, table, 10, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), rtol=1e-6)


def test_supports_gate():
    assert supports(TILE_B, 4 * TILE_V, 256)
    assert not supports(TILE_B - 1, 4 * TILE_V, 256)
    assert not supports(TILE_B, 4 * TILE_V + 1, 256)
