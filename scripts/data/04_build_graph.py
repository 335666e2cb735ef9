#!/usr/bin/env python3
"""Build the item co-occurrence graph (reference scripts/data/
04_build_graph.py parity; core logic in data/graph.py). Writes the CSV edge
list (reference format), a packed npz (the fast-load artifact), and stats."""

import argparse
import json
from pathlib import Path

import pandas as pd

from gat_recommendation_tpu.data.graph import build_co_event_graph, save_edges
from gat_recommendation_tpu.utils.logging import get_logger


def main() -> None:
    p = argparse.ArgumentParser(description="Build co-occurrence graph")
    p.add_argument("--input-file", type=str, default="data/processed/train.csv")
    p.add_argument("--output-file", type=str, default="data/processed/graph_edges.csv")
    p.add_argument("--stats-file", type=str, default="data/processed/graph_stats.json")
    p.add_argument("--window", type=int, default=5)
    args = p.parse_args()

    logger = get_logger(__name__)
    sessions = pd.read_csv(args.input_file)
    edges, stats = build_co_event_graph(sessions, window=args.window)

    out = Path(args.output_file)
    save_edges(edges, out, out.with_suffix(".npz"))
    Path(args.stats_file).parent.mkdir(parents=True, exist_ok=True)
    with open(args.stats_file, "w") as f:
        json.dump(stats, f, indent=2)
    logger.info(
        f"{stats['num_nodes']:,} nodes / {stats['num_edges']:,} edges "
        f"(avg degree {stats['avg_degree']:.2f}) -> {out} (+.npz)"
    )


if __name__ == "__main__":
    main()
