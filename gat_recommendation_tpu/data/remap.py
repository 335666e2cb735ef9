"""Optional contiguous item-id remapping.

The reference sizes its embedding table by the RAW max item id + 1
(466,865 rows for RetailRocket) even though only 82,173 items appear in the
co-occurrence graph (reference dataloader.py:51-58; SURVEY.md §7 quirks).
That 5.7x table inflation is pure waste: HBM, optimizer state, checkpoint
size, and full-catalog scoring all scale with table rows. This module
implements the densification the reference never did, as an OPT-IN stage
(05_remap_ids.py) so default behavior stays reference-parity.

Id 0 remains the padding id; real items map to 1..num_unique. The inverse
map ships with the artifacts so serving can translate back to raw ids.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def build_id_map(*frames_and_edges) -> np.ndarray:
    """Ascending array of unique raw item ids across all inputs.

    Accepts DataFrames with an `itemid` column and (item_i, item_j) edge
    tuples. Position k in the result maps raw id -> contiguous id k+1
    (0 is reserved for padding).
    """
    pools = []
    for x in frames_and_edges:
        if isinstance(x, pd.DataFrame):
            pools.append(x["itemid"].to_numpy(np.int64))
        else:
            item_i, item_j = x
            pools.append(np.asarray(item_i, np.int64))
            pools.append(np.asarray(item_j, np.int64))
    # Raw id 0 (a real item in some datasets) maps to a live slot: in the
    # reference it collides with padding_idx=0 and silently gets a dead,
    # never-trained embedding — densification fixes that.
    return np.unique(np.concatenate(pools))


def _lookup(raw_ids: np.ndarray, id_map: np.ndarray) -> np.ndarray:
    pos = np.searchsorted(id_map, raw_ids)
    ok = (pos < len(id_map)) & (id_map[np.minimum(pos, len(id_map) - 1)] == raw_ids)
    if not ok.all():
        missing = np.asarray(raw_ids)[~ok][:5]
        raise KeyError(f"raw item ids not in id map (first few: {missing.tolist()})")
    return (pos + 1).astype(np.int64)  # contiguous ids start at 1


def remap_sessions(df: pd.DataFrame, id_map: np.ndarray) -> pd.DataFrame:
    out = df.copy()
    out["itemid"] = _lookup(out["itemid"].to_numpy(np.int64), id_map)
    return out


def remap_edges(item_i, item_j, id_map: np.ndarray):
    return _lookup(np.asarray(item_i, np.int64), id_map), _lookup(
        np.asarray(item_j, np.int64), id_map
    )
