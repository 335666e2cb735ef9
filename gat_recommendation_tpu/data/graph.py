"""Co-occurrence graph builder + edge IO (CSV for reference parity, npz packed).

Behavior parity with reference scripts/data/04_build_graph.py:25-127: pairs
within ±window steps per session, canonical (min, max) item ordering (event
pair and source timestamp swapped along with the items), per-edge count +
last canonical-source timestamp + event-pair histogram, self-loops preserved.
The reference's O(Σ len·window) Python pair loop is a shift-and-aggregate
here (one vectorized pass per offset d in 1..window).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd

DEFAULT_WINDOW = 5


def build_co_event_graph(
    sessions: pd.DataFrame, window: int = DEFAULT_WINDOW
) -> tuple[pd.DataFrame, dict]:
    """Return (edges_df[item_i, item_j, count, last_ts, event_pair_hist], stats)."""
    df = sessions.sort_values(["session_id", "timestamp"], kind="stable")
    sid = pd.factorize(df["session_id"])[0]
    items = df["itemid"].to_numpy(np.int64)
    ts = df["timestamp"].to_numpy(np.int64)
    ev = df["event"].to_numpy(object)

    parts_i, parts_j, parts_ep, parts_t = [], [], [], []
    for d in range(1, window + 1):
        if d >= len(items):
            break
        same = sid[d:] == sid[:-d]
        a, b = items[:-d][same], items[d:][same]
        ea, eb = ev[:-d][same], ev[d:][same]
        ta, tb = ts[:-d][same], ts[d:][same]
        swap = a > b
        parts_i.append(np.where(swap, b, a))
        parts_j.append(np.where(swap, a, b))
        # Canonical event pair: (event of canonical source, of canonical dest);
        # canonical-source timestamp (reference 04_build_graph.py:63-80).
        parts_ep.append(np.where(swap, eb, ea) + "_" + np.where(swap, ea, eb))
        parts_t.append(np.where(swap, tb, ta))

    if not parts_i:
        empty = pd.DataFrame(
            columns=["item_i", "item_j", "count", "last_ts", "event_pair_hist"]
        )
        return empty, {"num_nodes": 0, "num_edges": 0, "avg_degree": 0.0}

    pairs = pd.DataFrame(
        {
            "item_i": np.concatenate(parts_i),
            "item_j": np.concatenate(parts_j),
            "ep": np.concatenate(parts_ep),
            "ts": np.concatenate(parts_t),
        }
    )
    agg = (
        pairs.groupby(["item_i", "item_j"], sort=False)
        .agg(count=("ts", "size"), last_ts=("ts", "max"))
        .reset_index()
    )
    hist_counts = pairs.groupby(["item_i", "item_j", "ep"], sort=False).size()
    hist_map: dict[tuple[int, int], dict[str, int]] = {}
    for (ii, jj, ep), c in hist_counts.items():
        hist_map.setdefault((int(ii), int(jj)), {})[str(ep)] = int(c)
    agg["event_pair_hist"] = [
        hist_map[(int(r.item_i), int(r.item_j))] for r in agg.itertuples()
    ]
    edges_df = agg.sort_values("count", ascending=False).reset_index(drop=True)

    num_nodes = len(set(edges_df["item_i"]) | set(edges_df["item_j"]))
    num_edges = len(edges_df)
    stats = {
        "num_nodes": num_nodes,
        "num_edges": num_edges,
        "avg_degree": 2 * num_edges / num_nodes if num_nodes else 0.0,
        "edge_count_mean": float(edges_df["count"].mean()),
        "edge_count_median": float(edges_df["count"].median()),
        "edge_count_min": int(edges_df["count"].min()),
        "edge_count_max": int(edges_df["count"].max()),
    }
    return edges_df, stats


def save_edges(edges_df: pd.DataFrame, csv_path, npz_path=None) -> None:
    """CSV (reference column format, histogram as JSON) + packed npz for
    fast loading (the npz is what training/serving actually read)."""
    csv_path = Path(csv_path)
    csv_path.parent.mkdir(parents=True, exist_ok=True)
    out = edges_df.copy()
    out["event_pair_hist"] = out["event_pair_hist"].map(json.dumps)
    out.to_csv(csv_path, index=False)
    if npz_path is not None:
        np.savez_compressed(
            npz_path,
            item_i=edges_df["item_i"].to_numpy(np.int64),
            item_j=edges_df["item_j"].to_numpy(np.int64),
            count=edges_df["count"].to_numpy(np.int64),
            last_ts=edges_df["last_ts"].to_numpy(np.int64),
        )


def load_edges(path) -> tuple[np.ndarray, np.ndarray]:
    """(item_i, item_j) int64 arrays from .npz (fast) or .csv (reference format)."""
    path = Path(path)
    if not path.exists():
        # Sibling-extension fallback: the packed npz is the committed form at
        # reference scale (the 67 MB CSV duplicate is not tracked); accept
        # either spelling so callers can pass the reference-parity .csv path.
        sibling = path.with_suffix(".npz" if path.suffix == ".csv" else ".csv")
        if sibling.exists():
            path = sibling
    if path.suffix == ".npz":
        with np.load(path) as z:
            return z["item_i"].astype(np.int64), z["item_j"].astype(np.int64)
    df = pd.read_csv(path, usecols=["item_i", "item_j"])
    return df["item_i"].to_numpy(np.int64), df["item_j"].to_numpy(np.int64)
