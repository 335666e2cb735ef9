#!/usr/bin/env python3
"""Optional stage 5: contiguous item-id remap (densify the catalog).

The reference keeps raw item ids and sizes the embedding table by
max-id + 1 (466,865 rows vs 82,173 distinct items — SURVEY.md §7). Running
this stage after 04 rewrites train/val/test/graph with contiguous ids
1..num_unique, writes id_map.npy (contiguous -> raw) for serving, and
updates split_info.json's num_items. Training then uses a ~5.7x smaller
table with identical semantics.
"""

import argparse
import json
from pathlib import Path

import numpy as np
import pandas as pd

from gat_recommendation_tpu.data.graph import load_edges
from gat_recommendation_tpu.data.remap import build_id_map, remap_edges, remap_sessions
from gat_recommendation_tpu.utils.logging import get_logger


def main() -> None:
    p = argparse.ArgumentParser(description="Contiguous item-id remap")
    p.add_argument("--data-dir", type=str, default="data/processed")
    p.add_argument("--output-dir", type=str, default="data/processed_dense")
    args = p.parse_args()

    logger = get_logger(__name__)
    src = Path(args.data_dir)
    dst = Path(args.output_dir)
    dst.mkdir(parents=True, exist_ok=True)

    frames = {name: pd.read_csv(src / f"{name}.csv") for name in ("train", "val", "test")}
    edges = load_edges(src / "graph_edges.npz" if (src / "graph_edges.npz").exists()
                       else src / "graph_edges.csv")
    id_map = build_id_map(*frames.values(), edges)
    num_items = len(id_map) + 1  # + padding id 0
    logger.info(f"{len(id_map):,} distinct items -> contiguous catalog of {num_items:,} "
                f"(raw max id was {int(id_map.max()):,})")

    for name, df in frames.items():
        remap_sessions(df, id_map).to_csv(dst / f"{name}.csv", index=False)
    ei, ej = remap_edges(*edges, id_map)
    np.savez_compressed(dst / "graph_edges.npz", item_i=ei, item_j=ej)
    pd.DataFrame({"item_i": ei, "item_j": ej}).to_csv(dst / "graph_edges.csv", index=False)
    np.save(dst / "id_map.npy", id_map)

    with open(src / "split_info.json") as f:
        info = json.load(f)
    info["num_items"] = num_items
    info["raw_num_items"] = int(id_map.max()) + 1
    info["id_map_file"] = "id_map.npy"
    with open(dst / "split_info.json", "w") as f:
        json.dump(info, f, indent=2)
    logger.info(f"Dense artifacts -> {dst}")


if __name__ == "__main__":
    main()
