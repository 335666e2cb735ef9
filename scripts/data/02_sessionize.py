#!/usr/bin/env python3
"""Sessionize raw events (reference scripts/data/02_sessionize.py parity;
core logic in data/sessionize.py)."""

import argparse
import json
from pathlib import Path

import pandas as pd

from gat_recommendation_tpu.data.sessionize import compute_session_stats, sessionize_events
from gat_recommendation_tpu.utils.logging import get_logger


def main() -> None:
    p = argparse.ArgumentParser(description="Sessionize events")
    p.add_argument("--input-file", type=str, default="data/raw/events.csv")
    p.add_argument("--output-file", type=str, default="data/interim/sessions.csv")
    p.add_argument("--stats-file", type=str, default="data/interim/session_stats.json")
    p.add_argument("--gap-minutes", type=int, default=30)
    p.add_argument("--min-length", type=int, default=3)
    args = p.parse_args()

    logger = get_logger(__name__)
    events = pd.read_csv(args.input_file)
    logger.info(f"Loaded {len(events):,} events from {args.input_file}")

    sessions = sessionize_events(events, gap_minutes=args.gap_minutes, min_length=args.min_length)
    stats = compute_session_stats(sessions)

    out = Path(args.output_file)
    out.parent.mkdir(parents=True, exist_ok=True)
    sessions.to_csv(out, index=False)
    Path(args.stats_file).parent.mkdir(parents=True, exist_ok=True)
    with open(args.stats_file, "w") as f:
        json.dump(stats, f, indent=2)
    logger.info(
        f"{stats['num_sessions']:,} sessions / {stats['num_events']:,} events "
        f"(mean length {stats['session_length_mean']:.2f}) -> {out}"
    )


if __name__ == "__main__":
    main()
