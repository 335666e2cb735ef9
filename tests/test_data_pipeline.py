"""Data pipeline unit tests: synthetic gen, sessionize, split, graph builder."""

import json

import numpy as np
import pandas as pd
import pytest

from gat_recommendation_tpu.data import (
    build_co_event_graph,
    create_temporal_splits,
    generate_synthetic_events,
    sessionize_events,
)
from gat_recommendation_tpu.data.graph import load_edges, save_edges
from gat_recommendation_tpu.data.sessionize import compute_session_stats


@pytest.fixture(scope="module")
def events():
    return generate_synthetic_events(num_sessions=200, num_items=100, seed=7)


@pytest.fixture(scope="module")
def sessions(events):
    return sessionize_events(events)


def test_synthetic_schema(events):
    assert list(events.columns) == ["timestamp", "visitorid", "event", "itemid", "transactionid"]
    assert set(events["event"]).issubset({"view", "addtocart", "transaction"})
    assert events["timestamp"].is_monotonic_increasing
    assert events["itemid"].between(0, 99).all()


def test_synthetic_deterministic():
    a = generate_synthetic_events(num_sessions=20, num_items=50, seed=3)
    b = generate_synthetic_events(num_sessions=20, num_items=50, seed=3)
    pd.testing.assert_frame_equal(a, b)


class TestStructuredCorpus:
    """The discriminative generator: latent clustered-Markov walk sessions
    (data/synthetic.py generate_structured_events)."""

    @pytest.fixture(scope="class")
    def structured(self):
        from gat_recommendation_tpu.data import generate_structured_events

        return generate_structured_events(
            num_sessions=600, num_items=5_000, num_active=900, num_clusters=9, seed=5
        )

    def test_schema_and_monotonicity(self, structured):
        assert list(structured.columns) == [
            "timestamp", "visitorid", "event", "itemid", "transactionid",
        ]
        assert structured["timestamp"].is_monotonic_increasing
        assert set(structured["event"]).issubset({"view", "addtocart", "transaction"})

    def test_deterministic(self):
        from gat_recommendation_tpu.data import generate_structured_events

        kw = dict(num_sessions=40, num_items=800, num_active=200, num_clusters=4, seed=3)
        pd.testing.assert_frame_equal(
            generate_structured_events(**kw), generate_structured_events(**kw)
        )

    def test_active_catalog_bounded(self, structured):
        ids = structured["itemid"].unique()
        assert len(ids) <= 900
        assert (ids >= 1).all() and (ids < 5_000).all()  # id 0 = padding row

    def test_sessions_survive_sessionize_intact(self, structured):
        sess = sessionize_events(structured)
        lengths = sess.groupby("session_id").size()
        assert sess["session_id"].nunique() == 600  # no session split or dropped
        assert lengths.min() >= 3 and lengths.max() <= 50

    def test_targets_are_walk_predictable(self, structured):
        """The signal the corpus exists to carry: the final (target) item is
        drawn from the latent transition structure, so the fraction of
        targets that also occur in their session's context (walk revisits)
        must far exceed what independent popularity draws would give, while
        a near-flat popularity baseline stays weak."""
        sess = sessionize_events(structured)
        per = sess.sort_values(["session_id", "timestamp"]).groupby("session_id")["itemid"].agg(list)
        in_ctx = np.mean([t[-1] in t[:-1] for t in per])
        assert 0.1 < in_ctx < 0.7  # repeat_prob=0.25 + graph cycles
        # Popularity baseline: top-10 items rarely contain the target, and
        # carry far less signal than the walk structure. (Bound is loose at
        # this 900-item test scale — at the reference-scale 82k-item corpus
        # the same baseline measures < 1%, docs/EXPERIMENTS.md.)
        pop = sess.groupby("itemid").size().sort_values(ascending=False)
        top10 = set(pop.index[:10])
        r10 = np.mean([t[-1] in top10 for t in per])
        assert r10 < 0.12 and r10 < in_ctx / 2


def test_sessionize_min_length(sessions):
    lengths = sessions.groupby("session_id").size()
    assert (lengths >= 3).all()


def test_sessionize_gap_rule():
    # Events 40 min apart must split into two sessions; the 3-event session survives.
    ms = 60_000
    df = pd.DataFrame(
        {
            "timestamp": [0, 5 * ms, 10 * ms, 50 * ms],
            "visitorid": ["v1"] * 4,
            "event": ["view"] * 4,
            "itemid": [1, 2, 3, 4],
            "transactionid": [None] * 4,
        }
    )
    out = sessionize_events(df)
    assert len(out) == 3  # the lone 4th event's session is dropped (min length 3)
    assert out["session_id"].nunique() == 1


def test_sessionize_per_visitor_boundaries():
    ms = 60_000
    df = pd.DataFrame(
        {
            "timestamp": [0, ms, 2 * ms, 0, ms, 2 * ms],
            "visitorid": ["a", "a", "a", "b", "b", "b"],
            "event": ["view"] * 6,
            "itemid": [1, 2, 3, 4, 5, 6],
            "transactionid": [None] * 6,
        }
    )
    out = sessionize_events(df)
    assert out["session_id"].nunique() == 2


def test_session_stats_keys(sessions):
    stats = compute_session_stats(sessions)
    assert stats["num_sessions"] == sessions["session_id"].nunique()
    assert stats["session_length_min"] >= 3


def test_temporal_split_no_leakage(sessions):
    train, val, test, info = create_temporal_splits(sessions, blackout_days=2)
    blackout_ms = 2 * 24 * 60 * 60 * 1000
    assert train["timestamp"].max() + blackout_ms <= val["timestamp"].min() + blackout_ms * 2
    # Strict check mirroring tests/test_splits.py: train_max + blackout <= val_min.
    assert train["timestamp"].max() <= info["train_blackout_end_ts"]
    assert val["timestamp"].min() > info["train_blackout_end_ts"]
    assert test["timestamp"].min() > info["val_blackout_end_ts"]
    # Zero session overlap.
    assert not set(train.session_id) & set(val.session_id)
    assert not set(val.session_id) & set(test.session_id)
    assert info["num_items"] == int(sessions["itemid"].max()) + 1


def test_split_counts_sum(sessions):
    train, val, test, info = create_temporal_splits(sessions)
    total = (
        info["train_sessions"]
        + info["val_sessions"]
        + info["test_sessions"]
        + info["blackout_1_sessions"]
        + info["blackout_2_sessions"]
    )
    assert total == sessions["session_id"].nunique()


def test_graph_builder_hand_case():
    # One session: items [1, 2, 1], window 5 -> pairs (1,2),(2,1)->(1,2),(1,1).
    df = pd.DataFrame(
        {
            "timestamp": [10, 20, 30],
            "visitorid": ["v"] * 3,
            "event": ["view", "addtocart", "view"],
            "itemid": [1, 2, 1],
            "transactionid": [None] * 3,
            "session_id": ["s1"] * 3,
        }
    )
    edges, stats = build_co_event_graph(df, window=5)
    by_pair = {(r.item_i, r.item_j): r for r in edges.itertuples()}
    assert set(by_pair) == {(1, 2), (1, 1)}
    assert by_pair[(1, 2)].count == 2  # (1@10,2@20) and canonicalized (2@20,1@30)
    assert by_pair[(1, 1)].count == 1  # self-pair (1@10, 1@30)
    # Both pairs canonicalize to source=item1 'view', dest=item2 'addtocart'.
    assert by_pair[(1, 2)].event_pair_hist == {"view_addtocart": 2}
    assert by_pair[(1, 2)].last_ts == 30
    assert by_pair[(1, 1)].event_pair_hist == {"view_view": 1}
    assert stats["num_nodes"] == 2


def test_graph_builder_window_limit():
    items = list(range(10))
    df = pd.DataFrame(
        {
            "timestamp": np.arange(10) * 1000,
            "visitorid": ["v"] * 10,
            "event": ["view"] * 10,
            "itemid": items,
            "transactionid": [None] * 10,
            "session_id": ["s"] * 10,
        }
    )
    edges, _ = build_co_event_graph(df, window=3)
    # Pair (0, 4) is 4 steps apart -> must not exist; (0, 3) must.
    pairs = set(zip(edges["item_i"], edges["item_j"]))
    assert (0, 3) in pairs and (0, 4) not in pairs


def test_graph_builder_respects_session_boundary():
    df = pd.DataFrame(
        {
            "timestamp": [0, 1, 2, 3, 4, 5],
            "visitorid": ["v"] * 6,
            "event": ["view"] * 6,
            "itemid": [1, 2, 3, 4, 5, 6],
            "transactionid": [None] * 6,
            "session_id": ["a", "a", "a", "b", "b", "b"],
        }
    )
    edges, _ = build_co_event_graph(df, window=5)
    pairs = set(zip(edges["item_i"], edges["item_j"]))
    assert (3, 4) not in pairs  # crosses the a|b boundary
    assert (1, 2) in pairs and (4, 5) in pairs


def test_edges_roundtrip(tmp_path, sessions):
    edges, _ = build_co_event_graph(sessions)
    save_edges(edges, tmp_path / "e.csv", tmp_path / "e.npz")
    ci, cj = load_edges(tmp_path / "e.csv")
    ni, nj = load_edges(tmp_path / "e.npz")
    np.testing.assert_array_equal(ci, ni)
    np.testing.assert_array_equal(cj, nj)
    # CSV histogram column is valid JSON.
    df = pd.read_csv(tmp_path / "e.csv")
    json.loads(df["event_pair_hist"].iloc[0])
