#!/usr/bin/env python3
"""Regenerate the committed reference-scale corpus from its manifest.

The corpus-v3 split CSVs (~72 MB) were rewritten three times across corpus
iterations and tripled `.git` (VERDICT r4 weak #4), so round 5 untracked
them: `data_refscale/MANIFEST.json` now records the generator parameters
and the sha256 of every derived file, and this script rebuilds the corpus
deterministically (fixed seeds end to end — same stages as
scripts/pipeline/run_refscale_study.sh's data block, in-process). CI runs
it before pytest so the contract/leakage tests keep RUNNING against the
reference-scale corpus instead of skipping.

Run CPU-only:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/data/regen_refscale.py [--check]

--check: after regeneration (or against existing files), verify the sha256
of every manifest-listed file and exit non-zero on drift.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

DATA_DIR = ROOT / "data_refscale"
MANIFEST = DATA_DIR / "MANIFEST.json"


def sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def generate(params: dict) -> None:
    from gat_recommendation_tpu.data import (
        create_temporal_splits,
        generate_structured_events,
        sessionize_events,
    )
    from gat_recommendation_tpu.data.graph import build_co_event_graph

    import io

    import pandas as pd

    def csv_roundtrip(df):
        """The committed corpus was produced by the script pipeline, whose
        stages hand off through CSV files (00 -> 02 -> 03 -> 04). A CSV
        roundtrip is not the identity on dtypes (a mostly-NaN int column
        like transactionid comes back float64 and re-serializes as
        '11533.0'), so sha-exact regeneration must replay each boundary."""
        return pd.read_csv(io.StringIO(df.to_csv(index=False)))

    t0 = time.time()
    events = csv_roundtrip(generate_structured_events(**params))
    print(f"[{time.time() - t0:.1f}s] generated {len(events)} events")
    sessions = csv_roundtrip(sessionize_events(events))
    (DATA_DIR / "interim").mkdir(parents=True, exist_ok=True)
    train_df, val_df, test_df, info = create_temporal_splits(sessions)
    processed = DATA_DIR / "processed"
    processed.mkdir(parents=True, exist_ok=True)
    train_df.to_csv(processed / "train.csv", index=False)
    val_df.to_csv(processed / "val.csv", index=False)
    test_df.to_csv(processed / "test.csv", index=False)
    (processed / "split_info.json").write_text(json.dumps(info, indent=2))
    print(f"[{time.time() - t0:.1f}s] splits written")
    # Stage 04 reads processed/train.csv from disk — replay that boundary,
    # and serialize through the same save_edges (CSV + packed npz formats).
    from gat_recommendation_tpu.data.graph import save_edges

    edges_df, stats = build_co_event_graph(pd.read_csv(processed / "train.csv"))
    out = processed / "graph_edges.csv"
    save_edges(edges_df, out, out.with_suffix(".npz"))
    with open(processed / "graph_stats.json", "w") as f:
        json.dump(stats, f, indent=2)
    print(f"[{time.time() - t0:.1f}s] graph built ({stats['num_edges']} edges)")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--check", action="store_true", help="verify sha256s")
    p.add_argument("--force", action="store_true", help="regenerate even if present")
    args = p.parse_args()

    manifest = json.loads(MANIFEST.read_text())
    missing = [
        f for f in manifest["files"] if not (DATA_DIR / f).exists()
    ]
    if missing or args.force:
        print(f"regenerating (missing: {missing or 'forced'})")
        generate(manifest["generator_params"])
    else:
        print("all files present, skipping generation")

    if args.check:
        bad = []
        for f, want in manifest["files"].items():
            got = sha256(DATA_DIR / f)
            if got != want:
                bad.append((f, want, got))
        if bad:
            for f, want, got in bad:
                print(f"DRIFT {f}: manifest {want[:12]}.. got {got[:12]}..")
            sys.exit(1)
        print(f"{len(manifest['files'])} files verified against manifest")


if __name__ == "__main__":
    main()
