#!/usr/bin/env python3
"""Temporal 70/15/15 split with blackout windows (reference scripts/data/
03_temporal_split.py parity; core logic in data/splits.py). Writes
train/val/test.csv + split_info.json (carries num_items)."""

import argparse
import json
from pathlib import Path

import pandas as pd

from gat_recommendation_tpu.data.splits import create_temporal_splits
from gat_recommendation_tpu.utils.logging import get_logger


def main() -> None:
    p = argparse.ArgumentParser(description="Create temporal splits")
    p.add_argument("--input-file", type=str, default="data/interim/sessions.csv")
    p.add_argument("--output-dir", type=str, default="data/processed")
    p.add_argument("--train-ratio", type=float, default=0.70)
    p.add_argument("--val-ratio", type=float, default=0.15)
    p.add_argument("--test-ratio", type=float, default=0.15)
    p.add_argument("--blackout-days", type=int, default=2)
    args = p.parse_args()

    logger = get_logger(__name__)
    sessions = pd.read_csv(args.input_file)
    train, val, test, info = create_temporal_splits(
        sessions,
        train_ratio=args.train_ratio,
        val_ratio=args.val_ratio,
        test_ratio=args.test_ratio,
        blackout_days=args.blackout_days,
    )

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    train.to_csv(out_dir / "train.csv", index=False)
    val.to_csv(out_dir / "val.csv", index=False)
    test.to_csv(out_dir / "test.csv", index=False)
    with open(out_dir / "split_info.json", "w") as f:
        json.dump(info, f, indent=2)

    logger.info(
        f"train/val/test sessions: {info['train_sessions']:,}/"
        f"{info['val_sessions']:,}/{info['test_sessions']:,} "
        f"(blackouts dropped: {info['blackout_1_sessions'] + info['blackout_2_sessions']:,}); "
        f"num_items={info['num_items']:,}"
    )
    # Leakage warnings (reference parity).
    if len(train) and len(val) and train["timestamp"].max() >= val["timestamp"].min():
        logger.warning("Potential temporal leakage: train overlaps val")
    if len(val) and len(test) and val["timestamp"].max() >= test["timestamp"].min():
        logger.warning("Potential temporal leakage: val overlaps test")


if __name__ == "__main__":
    main()
