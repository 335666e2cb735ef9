"""Contiguous id-remap: bijection, padding preservation, edge consistency."""

import numpy as np
import pandas as pd
import pytest

from gat_recommendation_tpu.data.remap import build_id_map, remap_edges, remap_sessions


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "session_id": ["s"] * 30,
        "timestamp": np.arange(30),
        "itemid": rng.choice([5, 17, 900, 12345, 7], 30),
    })
    edges = (np.array([5, 17, 900]), np.array([17, 12345, 5]))
    return df, edges


def test_contiguous_and_bijective(data):
    df, edges = data
    id_map = build_id_map(df, edges)
    out = remap_sessions(df, id_map)
    new_ids = np.unique(out["itemid"])
    assert new_ids.min() >= 1
    assert new_ids.max() == len(np.unique(df["itemid"]))
    # Round trip: id_map[contig - 1] recovers the raw id.
    assert (id_map[out["itemid"].to_numpy() - 1] == df["itemid"].to_numpy()).all()


def test_edges_consistent_with_sessions(data):
    df, edges = data
    id_map = build_id_map(df, edges)
    ei, ej = remap_edges(*edges, id_map)
    # Same raw pair relationships under the map.
    assert (id_map[ei - 1] == edges[0]).all()
    assert (id_map[ej - 1] == edges[1]).all()


def test_raw_zero_gets_live_slot():
    # Raw item 0 collides with padding in the reference; densification
    # maps it to a real contiguous id >= 1.
    df = pd.DataFrame({"session_id": ["s"] * 3, "timestamp": [0, 1, 2],
                       "itemid": [0, 9, 9]})
    id_map = build_id_map(df, (np.array([9]), np.array([9])))
    out = remap_sessions(df, id_map)
    assert out["itemid"].min() >= 1
    assert (id_map[out["itemid"].to_numpy() - 1] == df["itemid"].to_numpy()).all()


def test_unknown_id_raises(data):
    df, edges = data
    id_map = build_id_map(df, edges)
    with pytest.raises(KeyError):
        remap_sessions(pd.DataFrame({"session_id": ["x"], "timestamp": [0],
                                     "itemid": [99999999]}), id_map)
