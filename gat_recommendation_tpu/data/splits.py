"""Temporal 70/15/15 session split with blackout windows.

Behavior parity with reference scripts/data/03_temporal_split.py:28-162:
per-session (start, end) timestamps, index-based cut points over sessions
sorted by start time, +blackout_days windows after the train and val
boundaries, per-session assignment, blackout sessions dropped. The
per-session `assign_split` apply-loop is replaced by np.select.

split_info carries `num_items` (consumed by training, reference
train_baseline.py:145-150).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MS_PER_DAY = 24 * 60 * 60 * 1000


def create_temporal_splits(
    sessions: pd.DataFrame,
    train_ratio: float = 0.70,
    val_ratio: float = 0.15,
    test_ratio: float = 0.15,
    blackout_days: int = 2,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame, dict]:
    """Return (train, val, test, split_info); blackout sessions are dropped."""
    times = sessions.groupby("session_id")["timestamp"].agg(["min", "max"]).reset_index()
    times.columns = ["session_id", "start_ts", "end_ts"]
    times = times.sort_values("start_ts").reset_index(drop=True)

    n = len(times)
    train_end_idx = int(n * train_ratio)
    val_end_idx = int(n * (train_ratio + val_ratio))
    train_end_ts = int(times.iloc[train_end_idx - 1]["end_ts"])
    val_end_ts = int(times.iloc[val_end_idx - 1]["end_ts"])

    blackout_ms = blackout_days * MS_PER_DAY
    train_blackout_end = train_end_ts + blackout_ms
    val_blackout_end = val_end_ts + blackout_ms

    start = times["start_ts"].to_numpy(np.int64)
    end = times["end_ts"].to_numpy(np.int64)
    times["split"] = np.select(
        [
            end <= train_end_ts,
            start <= train_blackout_end,
            end <= val_end_ts,
            start <= val_blackout_end,
        ],
        ["train", "blackout_1", "val", "blackout_2"],
        default="test",
    )
    split_counts = times["split"].value_counts()

    valid = times[~times["split"].str.startswith("blackout")]
    with_split = sessions.merge(valid[["session_id", "split"]], on="session_id", how="inner")
    train_df = with_split[with_split["split"] == "train"].drop(columns=["split"])
    val_df = with_split[with_split["split"] == "val"].drop(columns=["split"])
    test_df = with_split[with_split["split"] == "test"].drop(columns=["split"])

    split_info = {
        "train_ratio": train_ratio,
        "val_ratio": val_ratio,
        "test_ratio": test_ratio,
        "blackout_days": blackout_days,
        "train_sessions": int(train_df["session_id"].nunique()),
        "val_sessions": int(val_df["session_id"].nunique()),
        "test_sessions": int(test_df["session_id"].nunique()),
        "train_events": int(len(train_df)),
        "val_events": int(len(val_df)),
        "test_events": int(len(test_df)),
        "blackout_1_sessions": int(split_counts.get("blackout_1", 0)),
        "blackout_2_sessions": int(split_counts.get("blackout_2", 0)),
        "train_end_ts": train_end_ts,
        "val_end_ts": val_end_ts,
        "train_blackout_end_ts": train_blackout_end,
        "val_blackout_end_ts": val_blackout_end,
        # Catalog size = raw max item id + 1 (reference quirk preserved:
        # 466,865 raw ids vs 82,173 connected nodes — SURVEY.md §7).
        "num_items": int(sessions["itemid"].max()) + 1,
    }
    return train_df, val_df, test_df, split_info
