"""Full-catalog top-k selectors: equivalence with the dense lax.top_k oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from gat_recommendation_tpu.ops import scoring


def make(V, D=16, B=4, seed=0):
    rng = np.random.default_rng(seed)
    sess = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    return sess, table


# Small catalogs route to the dense fallback; force the two-level path by
# dropping the threshold.
@pytest.fixture(autouse=True)
def low_threshold(monkeypatch):
    monkeypatch.setattr(scoring, "MIN_ROWS_FOR_TWO_LEVEL", 64)


@pytest.mark.parametrize("V,chunk", [(128, 8), (512, 16), (1024, 32), (4096, 32)])
def test_two_level_matches_dense(V, chunk):
    sess, table = make(V)
    want_s, want_i = scoring.dense_topk(sess, table, 10)
    got_s, got_i = scoring.two_level_topk(sess, table, 10, chunk=chunk)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_two_level_phantom_rows_masked():
    sess, table = make(256, seed=1)
    num_items = 200  # rows 200..255 are phantom padding
    want_s, want_i = scoring.dense_topk(sess, table, 20, num_items)
    got_s, got_i = scoring.two_level_topk(sess, table, 20, num_items, chunk=8)
    assert (np.asarray(got_i) < num_items).all()
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_two_level_ties_resolve_to_lowest_index():
    sess = jnp.ones((1, 4), jnp.float32)
    table = jnp.ones((320, 4), jnp.float32)  # all scores equal
    _, got_i = scoring.two_level_topk(sess, table, 5, chunk=8)
    np.testing.assert_array_equal(np.asarray(got_i)[0], np.arange(5))


def test_two_level_cross_chunk_tie_matches_dense():
    """Regression (ADVICE r1): a tie spanning chunks must resolve to the
    LOWEST global index, like lax.top_k. scores [5,0,10,5] with chunk=2,
    k=2 previously returned [2,3] (candidate/chunk-rank order) vs dense
    [2,0]."""
    # Embed the literal counterexample: D=1 embeddings so scores are exact.
    sess = jnp.ones((1, 1), jnp.float32)
    table = jnp.asarray([[5.0], [0.0], [10.0], [5.0]] + [[-1.0]] * 60, jnp.float32)
    want_s, want_i = scoring.dense_topk(sess, table, 2)
    got_s, got_i = scoring.two_level_topk(sess, table, 2, chunk=2)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_array_equal(np.asarray(got_i)[0], [2, 0])


def test_two_level_random_ties_match_dense():
    """Exhaustive-ish tie fuzz: low-cardinality integer scores force many
    cross-chunk ties; two-level must match dense exactly, indices included."""
    rng = np.random.default_rng(0)
    for trial in range(8):
        V, chunk, k = 256, 8, 7
        # Rank-1 decomposition keeps scores exactly representable: sess=1.
        vals = rng.integers(0, 4, size=(V, 1)).astype(np.float32)
        sess = jnp.ones((3, 1), jnp.float32) * jnp.asarray([[1.0], [2.0], [0.5]])
        table = jnp.asarray(vals)
        want_s, want_i = scoring.dense_topk(sess, table, k)
        got_s, got_i = scoring.two_level_topk(sess, table, k, chunk=chunk)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_two_level_fallbacks():
    # Indivisible V and tiny catalogs fall back to dense (still correct).
    sess, table = make(100, seed=2)
    want_s, want_i = scoring.dense_topk(sess, table, 10)
    got_s, got_i = scoring.two_level_topk(sess, table, 10, chunk=32)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_approx_contains_reasonable_candidates():
    sess, table = make(2048, seed=3)
    want_s, want_i = scoring.dense_topk(sess, table, 10)
    got_s, got_i = scoring.approx_topk(sess, table, 10, candidates=512)
    # With L=512 of V=2048 the approx top-10 should agree almost always.
    agree = (np.asarray(got_i) == np.asarray(want_i)).mean()
    assert agree > 0.9, agree


@pytest.mark.parametrize("method", ["auto", "dense", "two_level", "approx"])
def test_dispatch_shapes(method):
    sess, table = make(512, seed=4)
    s, i = scoring.full_catalog_topk(sess, table, 7, method=method)
    assert s.shape == (4, 7) and i.shape == (4, 7)
    assert i.dtype == jnp.int32


def test_dispatch_rejects_unknown():
    sess, table = make(128)
    with pytest.raises(ValueError):
        scoring.full_catalog_topk(sess, table, 5, method="nope")


@pytest.mark.parametrize("V", [1000, 4096, 4100])  # 1000, 4100: -inf pad path
def test_two_level_scores_variant_matches_dense(V):
    """two_level_topk_scores (precomputed score matrix, any V via -inf
    column padding) == lax.top_k, including random-tie tie-breaks."""
    rng = np.random.default_rng(5)
    scores = jnp.asarray(rng.integers(0, 50, size=(6, V)), jnp.float32)  # many ties
    import jax

    want_s, want_i = jax.lax.top_k(scores, 10)
    got_s, got_i = scoring.two_level_topk_scores(scores, 10, chunk=32)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), rtol=1e-6)
