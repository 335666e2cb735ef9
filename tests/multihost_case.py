"""Shared deterministic training case for the multi-host tests.

Imported by both worker processes AND the single-process comparison run, so
every participant sees the identical dataset, model config, and schedule.
"""

import numpy as np
import pandas as pd

from gat_recommendation_tpu.data.batching import SessionDataset


def make_case(num_sessions: int = 120, num_items: int = 200):
    rng = np.random.default_rng(11)
    rows = []
    for s in range(num_sessions):
        length = int(rng.integers(3, 12))
        for t, item in enumerate(rng.integers(1, num_items, length)):
            rows.append((f"sess_{s:04d}", t * 1000, int(item)))
    df = pd.DataFrame(rows, columns=["session_id", "timestamp", "itemid"])
    split = df["session_id"] < f"sess_{int(num_sessions * 0.8):04d}"
    item_i = rng.integers(1, num_items, 600).astype(np.int64)
    item_j = rng.integers(1, num_items, 600).astype(np.int64)
    edges = (item_i, item_j)
    ds_train = SessionDataset(df[split], edges, num_negatives=5, num_items=num_items)
    ds_val = SessionDataset(df[~split], edges, num_negatives=5, num_items=num_items)
    return ds_train, ds_val, edges, num_items
