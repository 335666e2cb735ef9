"""Native int8 candidate scorer (native/scorer.cpp): correctness vs numpy.

The serving fast path quantizes the embedding table to int8 per-row, scans
it natively for top-L candidates, and re-ranks candidates exactly in f32
(serving/recommender.py). These tests pin: dequantization accuracy, top-k
recovery through the candidate set, seen/zero-row exclusion, and thread-count
invariance.
"""

import numpy as np
import pytest

from gat_recommendation_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libbatcher.so unavailable (no toolchain)"
)

V, D = 50_000, 64


@pytest.fixture(scope="module")
def quantized():
    rng = np.random.default_rng(3)
    table = rng.standard_normal((V, D), dtype=np.float32)
    table[0] = 0.0  # padding row
    q, scale, rowsum = native.quantize_table(table)
    return table, q, scale, rowsum


def test_quantization_roundtrip(quantized):
    table, q, scale, rowsum = quantized
    deq = q.astype(np.float32) * scale[:, None]
    # per-row max error <= scale/2 (round-to-nearest)
    err = np.abs(deq - table)
    assert (err <= scale[:, None] / 2 + 1e-7).all()
    np.testing.assert_array_equal(rowsum, q.astype(np.int64).sum(axis=1))
    assert scale[0] == 0.0 and (q[0] == 0).all()


def test_topl_recovers_exact_topk(quantized):
    table, q, scale, rowsum = quantized
    rng = np.random.default_rng(4)
    for trial in range(5):
        sess = rng.standard_normal(D).astype(np.float32)
        exact = table @ sess
        top10 = set(np.argsort(-exact)[:10].tolist())
        idx, approx = native.score_int8_topl(q, scale, rowsum, sess, 128)
        # exact re-rank of candidates (the serving procedure)
        rer = idx[np.argsort(-exact[idx])[:10]]
        assert top10 == set(rer.tolist()), f"trial {trial}"
        # approximate scores close to exact on the candidates
        np.testing.assert_allclose(approx, exact[idx], atol=0.5)


def test_seen_and_zero_rows_excluded(quantized):
    table, q, scale, rowsum = quantized
    sess = np.random.default_rng(5).standard_normal(D).astype(np.float32)
    exact = table @ sess
    banned = np.argsort(-exact)[:3]
    seen = np.zeros(V, np.uint8)
    seen[banned] = 1
    idx, _ = native.score_int8_topl(q, scale, rowsum, sess, 256, seen=seen)
    assert not (set(banned.tolist()) & set(idx.tolist()))
    assert 0 not in idx  # zero-scale padding row never a candidate


def test_thread_count_invariance(quantized):
    table, q, scale, rowsum = quantized
    sess = np.random.default_rng(6).standard_normal(D).astype(np.float32)
    results = [
        set(native.score_int8_topl(q, scale, rowsum, sess, 64, n_threads=t)[0].tolist())
        for t in (1, 2, 4)
    ]
    assert results[0] == results[1] == results[2]


@pytest.mark.parametrize("variant", ["default", "avx2"])
def test_adversarial_saturation_avx2(variant):
    """Max-magnitude query x max-magnitude rows with L << V.

    ADVICE r4 (medium): the AVX2 fallback used _mm256_maddubs_epi16, whose
    pairwise u8*s8 sums saturate at i16 (+-32767). With the session biased
    to u8 (255 at the query's largest coordinates) and rows at +-127, a
    pair sum reaches 2*255*127 = 64770 — exactly the high-scoring rows get
    silently underestimated and can drop out of the candidate set. The
    'avx2' variant builds the scorer with -mavx2 -mno-avx512f so the
    fallback is exercised even on VNNI hosts.
    """
    if variant == "avx2":
        lib = native.load_scorer_variant("libbatcher_avx2.so")
        if lib is None:
            pytest.skip("no toolchain for the AVX2-pinned build")
    else:
        lib = None
    rng = np.random.default_rng(7)
    V_, D_ = 1000, 64
    table = 0.05 * rng.standard_normal((V_, D_)).astype(np.float32)
    hot = [3, 500, 997]  # saturation-triggering rows, scattered across threads
    for i in hot:
        table[i] = 1.0  # quantizes to +127 everywhere
    q, scale, rowsum = native.quantize_table(table, lib=lib)
    sess = np.ones(D_, np.float32)  # quantizes to +127, biased u8 = 255
    idx, approx = native.score_int8_topl(q, scale, rowsum, sess, 8, lib=lib)
    # The hot rows are by construction the three highest-scoring rows; a
    # saturating scan underestimates them ~127x and drops them from top-8.
    assert set(hot) <= set(idx.tolist()), idx
    # Approximate scores must equal the exact int8 arithmetic (no rounding
    # beyond quantization itself: the dots are small exact integers in f32).
    sess_q = np.full(D_, 127, np.int64)
    exact_int = (q[idx].astype(np.int64) * sess_q).sum(axis=1)
    expect = scale[idx] * (1.0 / 127.0) * exact_int
    np.testing.assert_allclose(approx, expect, rtol=1e-5)
