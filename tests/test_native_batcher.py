"""Native C++ batcher: structural equivalence with the numpy engine."""

import numpy as np
import pandas as pd
import pytest

from gat_recommendation_tpu.data import native
from gat_recommendation_tpu.data.batching import SessionDataset, build_csr, iterate_batches

pytestmark = pytest.mark.skipif(not native.available(), reason="libbatcher.so unavailable")


def _make_dataset(num_sessions=60, num_items=80, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for s in range(num_sessions):
        length = rng.integers(3, 12)
        for t in range(length):
            rows.append((f"sess_{s:03d}", t * 1000, int(rng.integers(1, num_items))))
    df = pd.DataFrame(rows, columns=["session_id", "timestamp", "itemid"])
    item_i = rng.integers(1, num_items, 300)
    item_j = rng.integers(1, num_items, 300)
    return SessionDataset(df, (item_i, item_j), num_negatives=5), (item_i, item_j)


def test_native_csr_matches_numpy():
    rng = np.random.default_rng(1)
    item_i = rng.integers(0, 40, 200)
    item_j = rng.integers(0, 40, 200)
    ref = build_csr(item_i, item_j, 40)
    indptr, indices = native.build_csr(item_i, item_j, 40)
    np.testing.assert_array_equal(indptr, ref.indptr)
    np.testing.assert_array_equal(np.sort(indices), np.sort(ref.indices))
    # Rows sorted in both.
    for v in range(40):
        np.testing.assert_array_equal(
            indices[indptr[v] : indptr[v + 1]], np.sort(ref.indices[ref.indptr[v] : ref.indptr[v + 1]])
        )


def test_native_batches_match_numpy_engine():
    ds, _ = _make_dataset()
    nat = list(iterate_batches(ds, batch_size=8, shuffle=True, seed=3, engine="native"))
    ref = list(iterate_batches(ds, batch_size=8, shuffle=True, seed=3, engine="numpy"))
    assert len(nat) == len(ref)
    for a, b in zip(nat, ref):
        np.testing.assert_array_equal(a.node_ids, b.node_ids)
        np.testing.assert_array_equal(a.node_mask, b.node_mask)
        np.testing.assert_array_equal(a.adj, b.adj)
        np.testing.assert_array_equal(a.num_nodes, b.num_nodes)
        np.testing.assert_array_equal(a.targets, b.targets)
        np.testing.assert_array_equal(a.sample_mask, b.sample_mask)
        # Negatives use different RNGs; check validity, not equality.
        for row_n, row_t, valid in zip(a.negatives, a.targets, a.sample_mask):
            if valid:
                assert (row_n >= 1).all() and (row_n < ds.num_items).all()
                assert row_t not in row_n


def test_native_negatives_exclude_session():
    ds, _ = _make_dataset(seed=5)
    for batch in iterate_batches(ds, batch_size=8, shuffle=False, engine="native"):
        for b in range(batch.batch_size):
            if not batch.sample_mask[b]:
                continue
            session = set(batch.node_ids[b][batch.node_mask[b]].tolist())
            session.add(int(batch.targets[b]))
            assert not session & set(batch.negatives[b].tolist())


def test_native_deterministic():
    ds, _ = _make_dataset(seed=9)
    a = [b.negatives.tolist() for b in iterate_batches(ds, 8, seed=4, engine="native")]
    b = [b.negatives.tolist() for b in iterate_batches(ds, 8, seed=4, engine="native")]
    assert a == b


def test_native_throughput_sanity():
    """Native engine should not be slower than numpy (order-of-magnitude guard)."""
    import time

    ds, _ = _make_dataset(num_sessions=400, num_items=200, seed=2)
    t0 = time.perf_counter()
    n_nat = sum(1 for _ in iterate_batches(ds, 32, seed=1, engine="native"))
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_ref = sum(1 for _ in iterate_batches(ds, 32, seed=1, engine="numpy"))
    t_ref = time.perf_counter() - t0
    assert n_nat == n_ref
    assert t_nat < t_ref * 2.0  # generous: native must be in the same class or faster
