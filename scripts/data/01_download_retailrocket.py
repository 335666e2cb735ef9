#!/usr/bin/env python3
"""Download the RetailRocket dataset via the Kaggle API + verify its schema
(reference scripts/data/01_download_retailrocket.py:45-108 parity).

Requires Kaggle credentials (~/.kaggle/kaggle.json or KAGGLE_USERNAME/
KAGGLE_KEY). In egress-restricted environments use the synthetic generator
(00) or the YooChoose converter (01b) instead.
"""

import argparse
import sys
from pathlib import Path

import pandas as pd

from gat_recommendation_tpu.utils.logging import get_logger

DATASET = "retailrocket/ecommerce-dataset"
REQUIRED_COLUMNS = ["timestamp", "visitorid", "event", "itemid", "transactionid"]


def verify_schema(events_path: Path, logger) -> bool:
    head = pd.read_csv(events_path, nrows=1000)
    missing = set(REQUIRED_COLUMNS) - set(head.columns)
    if missing:
        logger.error(f"events.csv missing columns: {missing}")
        return False
    bad = set(head["event"].unique()) - {"view", "addtocart", "transaction"}
    if bad:
        logger.error(f"unexpected event types: {bad}")
        return False
    logger.info("Schema verification passed")
    return True


def main() -> None:
    p = argparse.ArgumentParser(description="Download RetailRocket from Kaggle")
    p.add_argument("--output-dir", type=str, default="data/raw")
    p.add_argument("--verify-only", action="store_true",
                   help="only verify an already-downloaded events.csv")
    args = p.parse_args()

    logger = get_logger(__name__)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    events_path = out_dir / "events.csv"

    if not args.verify_only:
        try:
            import kaggle  # type: ignore
        except Exception as e:
            logger.error(f"Kaggle API unavailable ({e}); use --verify-only or script 00")
            sys.exit(1)
        logger.info(f"Downloading {DATASET} -> {out_dir}")
        kaggle.api.dataset_download_files(DATASET, path=str(out_dir), unzip=True)

    if not events_path.exists():
        logger.error(f"{events_path} not found")
        sys.exit(1)
    sys.exit(0 if verify_schema(events_path, logger) else 1)


if __name__ == "__main__":
    main()
