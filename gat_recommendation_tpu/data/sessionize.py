"""Sessionization: 30-min inactivity gap, per-visitor boundaries, >=3 events.

Behavior parity with reference scripts/data/02_sessionize.py:25-127 (sort by
visitor+time, boolean new-session marks, cumsum ids, min-length filter), fully
vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_GAP_MINUTES = 30
DEFAULT_MIN_LENGTH = 3


def sessionize_events(
    events: pd.DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    min_length: int = DEFAULT_MIN_LENGTH,
) -> pd.DataFrame:
    """Assign `session_id` (sess_N) to events; drop sessions < min_length.

    A new session starts at a visitor change or an inactivity gap strictly
    greater than `gap_minutes` (timestamps in ms).
    """
    df = events.sort_values(["visitorid", "timestamp"], kind="stable").reset_index(drop=True)
    gap_ms = gap_minutes * 60_000

    visitor = df["visitorid"].to_numpy()
    ts = df["timestamp"].to_numpy(np.int64)
    new_session = np.ones(len(df), dtype=bool)
    if len(df) > 1:
        new_session[1:] = (visitor[1:] != visitor[:-1]) | ((ts[1:] - ts[:-1]) > gap_ms)
    raw_sid = np.cumsum(new_session) - 1

    # Min-length filter, then renumber surviving sessions consecutively.
    counts = np.bincount(raw_sid)
    keep = counts[raw_sid] >= min_length
    df = df[keep].reset_index(drop=True)
    kept_sid = raw_sid[keep]
    _, consecutive = np.unique(kept_sid, return_inverse=True)
    # Vectorized "sess_<n>" labels (a per-row Python lambda here was the one
    # non-vectorized step and the stage bottleneck at 2.7M events).
    df["session_id"] = np.char.add("sess_", consecutive.astype(np.str_))
    return df


def compute_session_stats(sessions: pd.DataFrame) -> dict:
    """Summary statistics of a sessionized frame (stats JSON payload)."""
    lengths = sessions.groupby("session_id").size()
    durations = sessions.groupby("session_id")["timestamp"].agg(lambda s: s.max() - s.min())
    return {
        "num_events": int(len(sessions)),
        "num_sessions": int(sessions["session_id"].nunique()),
        "num_visitors": int(sessions["visitorid"].nunique()),
        "num_unique_items": int(sessions["itemid"].nunique()),
        "session_length_min": int(lengths.min()),
        "session_length_mean": float(lengths.mean()),
        "session_length_median": float(lengths.median()),
        "session_length_max": int(lengths.max()),
        "session_duration_mean_s": float(durations.mean() / 1000.0),
        "event_counts": {k: int(v) for k, v in sessions["event"].value_counts().items()},
    }
