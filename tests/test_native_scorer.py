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
