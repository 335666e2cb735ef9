"""Batching layer tests: CSR induction vs brute force, collate shapes, buckets."""

import numpy as np
import pandas as pd
import pytest

from gat_recommendation_tpu.data.batching import (
    DEFAULT_BUCKETS,
    SessionDataset,
    build_csr,
    collate,
    induced_edges,
    iterate_batches,
    pick_bucket,
    sample_negatives,
)


def brute_force_induced(item_i, item_j, nodes):
    nodeset = {int(n): k for k, n in enumerate(nodes)}
    out = [
        (nodeset[int(a)], nodeset[int(b)])
        for a, b in zip(item_i, item_j)
        if int(a) in nodeset and int(b) in nodeset
    ]
    return sorted(out)


def test_induced_edges_matches_bruteforce():
    rng = np.random.default_rng(0)
    item_i = rng.integers(0, 50, 300)
    item_j = rng.integers(0, 50, 300)
    graph = build_csr(item_i, item_j, 50)
    for _ in range(10):
        nodes = np.unique(rng.integers(0, 50, 8))
        src, dst = induced_edges(graph, nodes)
        got = sorted(zip(src.tolist(), dst.tolist()))
        assert got == brute_force_induced(item_i, item_j, nodes)


def test_induced_edges_empty():
    graph = build_csr(np.array([1]), np.array([2]), 10)
    src, dst = induced_edges(graph, np.array([5, 7]))
    assert len(src) == 0 and len(dst) == 0


def test_sample_negatives_excludes_session():
    rng = np.random.default_rng(0)
    exclude = set(range(1, 90))
    negs = sample_negatives(rng, exclude, 100, 5)
    assert len(negs) == 5
    assert not set(negs.tolist()) & exclude
    assert (negs >= 1).all() and (negs < 100).all()


def test_sample_negatives_terminates_on_degenerate_catalogs():
    """Regression (ADVICE r1): rejection sampling must not loop forever when
    num_items <= 1 or the session covers (nearly) the whole catalog."""
    rng = np.random.default_rng(0)
    # Catalog of {0}: no valid candidate range at all.
    negs = sample_negatives(rng, set(), 1, 5)
    assert negs.shape == (5,)
    # Session covers every non-padding item: falls back to in-session negatives.
    negs = sample_negatives(rng, set(range(0, 4)), 4, 5)
    assert negs.shape == (5,)
    assert (negs >= 1).all() and (negs < 4).all()


def test_prefetch_abandoned_generator_stops_worker():
    """Regression (ADVICE r1): breaking out of a prefetch generator early
    must unblock (and stop) the worker thread instead of leaking it."""
    import threading
    import time

    from gat_recommendation_tpu.data.batching import prefetch_to_device

    produced = []

    def source():
        for i in range(100):
            produced.append(i)
            yield i

    before = threading.active_count()
    gen = prefetch_to_device(source(), size=2, transfer=lambda x: x)
    assert next(gen) == 0
    gen.close()  # abandon mid-epoch
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= before, "prefetch worker leaked"
    assert len(produced) < 100  # worker stopped early, didn't drain the source


def test_prefetch_pooled_transfers_preserve_order_and_errors():
    """transfer_workers > 1 runs transfers concurrently but must yield in
    iterator order, propagate transfer exceptions, and not leak threads."""
    import threading
    import time

    from gat_recommendation_tpu.data.batching import prefetch_to_device

    out = list(
        prefetch_to_device(
            iter(range(50)), size=4,
            transfer=lambda x: (time.sleep(0.001 * (x % 3)), x * 2)[1],
            transfer_workers=3,
        )
    )
    assert out == [x * 2 for x in range(50)]

    def bad_transfer(x):
        if x == 5:
            raise ValueError("boom")
        return x

    gen = prefetch_to_device(iter(range(10)), size=2, transfer=bad_transfer,
                             transfer_workers=2)
    with pytest.raises(ValueError, match="boom"):
        list(gen)

    before = threading.active_count()
    gen = prefetch_to_device(iter(range(100)), size=2, transfer=lambda x: x,
                             transfer_workers=2)
    assert next(gen) == 0
    gen.close()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= before, "pooled prefetch leaked threads"


def test_pick_bucket():
    assert pick_bucket(3, DEFAULT_BUCKETS) == 8
    assert pick_bucket(8, DEFAULT_BUCKETS) == 8
    assert pick_bucket(9, DEFAULT_BUCKETS) == 16
    assert pick_bucket(100, DEFAULT_BUCKETS) == 56


def _make_dataset(num_sessions=30, num_items=40, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for s in range(num_sessions):
        length = rng.integers(3, 10)
        items = rng.integers(1, num_items, length)
        for t, item in enumerate(items):
            rows.append(("sess_%d" % s, t * 1000, int(item)))
    df = pd.DataFrame(rows, columns=["session_id", "timestamp", "itemid"])
    item_i = rng.integers(1, num_items, 100)
    item_j = rng.integers(1, num_items, 100)
    return SessionDataset(df, (item_i, item_j), num_negatives=5)


def test_dataset_sample_semantics():
    ds = _make_dataset()
    rng = np.random.default_rng(1)
    s = ds.sample(0, rng)
    full = ds.session_items(0)
    assert s["target"] == full[-1]
    np.testing.assert_array_equal(s["nodes"], np.unique(full[:-1]))
    assert not set(s["negatives"].tolist()) & set(full.tolist())


def test_collate_adjacency_layout(dummy_batch):
    b = dummy_batch
    assert b.node_ids.shape == (2, 8)
    assert b.adj.shape == (2, 8, 8)
    # Session 1 edge 1->2 local (0 -> 1): adj[dst=1, src=0].
    assert b.adj[0, 1, 0] and b.adj[0, 0, 1]
    assert not b.adj[0, 0, 0]
    assert b.num_nodes.tolist() == [3, 4]
    assert b.sample_mask.all()
    # No edges touch padding slots.
    assert not b.adj[0, 3:, :].any() and not b.adj[0, :, 3:].any()


def test_collate_padded_sample():
    batch = collate([None, None], 8, 5)
    assert not batch.sample_mask.any()
    assert batch.adj.sum() == 0


def test_pack_adj_roundtrip(dummy_batch):
    """Bit-packed transfer form reconstructs the exact bool adjacency for
    every bucket width, including non-multiple-of-8 (N=56 is 7 full bytes,
    but guard the general slice path too)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gat_recommendation_tpu.data.batching import pack_adj, to_device

    rng = np.random.default_rng(0)
    for n in (8, 16, 56, 12):  # 12: forces the unpack slice to matter
        adj = rng.random((3, n, n)) < 0.3
        b = dataclasses.replace(
            dummy_batch,
            node_ids=np.zeros((3, n), np.int32),
            node_mask=np.ones((3, n), bool),
            adj=adj,
            num_nodes=np.full((3,), n, np.int32),
            targets=dummy_batch.targets[:1].repeat(3),
            negatives=dummy_batch.negatives[:1].repeat(3, axis=0),
            sample_mask=np.ones((3,), bool),
        )
        packed = pack_adj(b)
        assert packed.adj.dtype == np.uint8
        assert packed.adj.shape == (3, n, (n + 7) // 8)
        np.testing.assert_array_equal(np.asarray(packed.dense_adj()), adj)
        # pack is idempotent; dense_adj is a no-op on bool batches
        assert pack_adj(packed) is packed
        assert b.dense_adj() is adj
        # to_device packs only where a host->device wire exists (on the CPU
        # backend the unpack would cost with no transfer saving); dense_adj
        # works under jit either way.
        d = to_device(b)
        expect_packed = jax.default_backend() != "cpu"
        assert (d.adj.dtype == np.uint8) == expect_packed
        out = jax.jit(lambda bb: bb.dense_adj())(d)
        np.testing.assert_array_equal(np.asarray(out), adj)
        # The packed transfer form itself always round-trips under jit.
        dp = jax.tree.map(jnp.asarray, packed)
        out_p = jax.jit(lambda bb: bb.dense_adj())(dp)
        np.testing.assert_array_equal(np.asarray(out_p), adj)


def test_chain_iterator_grouping():
    """chain_iterator: order-preserving, bucket-homogeneous groups of at
    most `chain` items (the contract stack_batches relies on)."""
    from gat_recommendation_tpu.data.batching import chain_iterator

    ds = _make_dataset()
    items = list(iterate_batches(ds, batch_size=4, shuffle=True, seed=1))
    groups = list(chain_iterator(iter(items), chain=3))
    flat = [b for g in groups for b in g]
    assert [id(b) for b in flat] == [id(b) for b in items]  # order preserved
    for g in groups:
        assert 1 <= len(g) <= 3
        assert len({b.nodes_per_session for b in g}) == 1  # same node bucket


def test_iterate_batches_covers_epoch():
    ds = _make_dataset()
    seen = 0
    for batch in iterate_batches(ds, batch_size=4, shuffle=True, seed=0):
        assert batch.node_ids.shape[0] == 4
        assert batch.nodes_per_session in DEFAULT_BUCKETS
        seen += int(batch.sample_mask.sum())
    assert seen == len(ds)


def test_iterate_batches_deterministic():
    ds = _make_dataset()
    a = [b.targets[b.sample_mask].tolist() for b in iterate_batches(ds, 4, seed=5)]
    b = [b.targets[b.sample_mask].tolist() for b in iterate_batches(ds, 4, seed=5)]
    assert a == b


def test_truncation_to_max_length():
    rows = [("s", t, t % 7 + 1) for t in range(80)]
    df = pd.DataFrame(rows, columns=["session_id", "timestamp", "itemid"])
    ds = SessionDataset(df, (np.array([1]), np.array([2])), max_session_length=50)
    items = ds.session_items(0)
    assert len(items) == 50
    assert items[0] == 30 % 7 + 1  # kept the LAST 50 events


def test_large_max_session_length_extends_buckets():
    """Regression (VERDICT r1 weak #6): --max-session-length beyond the
    largest default bucket must not silently truncate nodes."""
    # One session of 70 distinct items: 69 unique context nodes > 56.
    rows = [("s", t, t + 1) for t in range(70)] * 1
    rows += [("t", t, t + 1) for t in range(5)]
    df = pd.DataFrame(rows, columns=["session_id", "timestamp", "itemid"])
    ds = SessionDataset(df, (np.array([1]), np.array([2])), max_session_length=100)
    batches = list(iterate_batches(ds, batch_size=2, shuffle=False, seed=0))
    seen_nodes = max(int(b.num_nodes.max()) for b in batches)
    assert seen_nodes == 69  # nothing dropped
    assert max(b.nodes_per_session for b in batches) >= 69
