#!/usr/bin/env python3
"""Generate synthetic RetailRocket-like events (reference scripts/data/
00_generate_synthetic_data.py parity; generator in data/synthetic.py)."""

import argparse
from pathlib import Path

from gat_recommendation_tpu.data.synthetic import generate_synthetic_events
from gat_recommendation_tpu.utils.logging import get_logger


def main() -> None:
    p = argparse.ArgumentParser(description="Generate synthetic event data")
    p.add_argument("--output-file", type=str, default="data/raw/events.csv")
    p.add_argument("--num-sessions", type=int, default=20_000)
    p.add_argument("--num-items", type=int, default=5_000)
    p.add_argument("--mean-session-length", type=int, default=8)
    p.add_argument("--zipf-exponent", type=float, default=1.5)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    logger = get_logger(__name__)
    events = generate_synthetic_events(
        num_sessions=args.num_sessions, num_items=args.num_items, seed=args.seed,
        mean_session_length=args.mean_session_length,
        zipf_exponent=args.zipf_exponent,
    )
    out = Path(args.output_file)
    out.parent.mkdir(parents=True, exist_ok=True)
    events.to_csv(out, index=False)
    logger.info(
        f"Wrote {len(events):,} events ({args.num_sessions:,} sessions, "
        f"{args.num_items:,} items) -> {out}"
    )


if __name__ == "__main__":
    main()
