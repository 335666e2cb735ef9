#!/usr/bin/env python3
"""Convert YooChoose (RecSys'15) clicks/buys to the events schema.

The reference ships YooChoose configs (configs/yoochoose_*.yaml) but no data
path for them (SURVEY.md §7 known quirks); this converter closes that gap:
yoochoose-clicks.dat / yoochoose-buys.dat -> the RetailRocket-style
events.csv consumed by 02_sessionize.py.
"""

import argparse
from pathlib import Path

import pandas as pd

from gat_recommendation_tpu.utils.logging import get_logger

CLICK_COLS = ["session", "ts", "itemid", "category"]
BUY_COLS = ["session", "ts", "itemid", "price", "quantity"]


def convert(clicks_path: Path, buys_path: Path | None) -> pd.DataFrame:
    clicks = pd.read_csv(clicks_path, names=CLICK_COLS, header=None)
    clicks["event"] = "view"
    frames = [clicks[["session", "ts", "itemid", "event"]]]
    if buys_path is not None and buys_path.exists():
        buys = pd.read_csv(buys_path, names=BUY_COLS, header=None)
        buys["event"] = "transaction"
        frames.append(buys[["session", "ts", "itemid", "event"]])
    df = pd.concat(frames, ignore_index=True)

    # YooChoose session ids become visitors; sessionization re-derives
    # session boundaries with the standard 30-min rule.
    df["timestamp"] = (
        pd.to_datetime(df["ts"], format="ISO8601", utc=True).astype("int64") // 1_000_000
    )
    df["visitorid"] = "yc_" + df["session"].astype(str)
    df["transactionid"] = None
    df.loc[df["event"] == "transaction", "transactionid"] = df["session"]
    df = df.sort_values("timestamp", kind="stable").reset_index(drop=True)
    return df[["timestamp", "visitorid", "event", "itemid", "transactionid"]]


def main() -> None:
    p = argparse.ArgumentParser(description="YooChoose -> events schema")
    p.add_argument("--clicks-file", type=str, required=True)
    p.add_argument("--buys-file", type=str, default=None)
    p.add_argument("--output-file", type=str, default="data/raw/events.csv")
    args = p.parse_args()

    logger = get_logger(__name__)
    out = Path(args.output_file)
    out.parent.mkdir(parents=True, exist_ok=True)
    events = convert(Path(args.clicks_file), Path(args.buys_file) if args.buys_file else None)
    events.to_csv(out, index=False)
    logger.info(f"Wrote {len(events):,} events -> {out}")


if __name__ == "__main__":
    main()
