"""Split-contract tests against real pipeline outputs (skip-if-absent).

Parity with reference tests/test_splits.py: no temporal leakage including the
blackout margin, blackout days in range, zero session overlap across splits.
"""

import json
from pathlib import Path

import pandas as pd
import pytest

PROCESSED = Path(__file__).parent.parent / "data" / "processed"

# Gate on the CSVs, not just split_info.json: run *stats* are committed as
# reference-scale evidence while the multi-GB CSVs themselves are not.
pytestmark = pytest.mark.skipif(
    not all((PROCESSED / f).exists() for f in ("split_info.json", "train.csv", "val.csv", "test.csv")),
    reason="split outputs absent (run `make data`)",
)


@pytest.fixture(scope="module")
def splits():
    return (
        pd.read_csv(PROCESSED / "train.csv"),
        pd.read_csv(PROCESSED / "val.csv"),
        pd.read_csv(PROCESSED / "test.csv"),
        json.loads((PROCESSED / "split_info.json").read_text()),
    )


def test_no_temporal_leakage_with_blackout(splits):
    train, val, test, info = splits
    blackout_ms = info["blackout_days"] * 24 * 60 * 60 * 1000
    assert train["timestamp"].max() + blackout_ms <= val["timestamp"].min() + blackout_ms
    assert val["timestamp"].min() > info["train_blackout_end_ts"]
    assert test["timestamp"].min() > info["val_blackout_end_ts"]


def test_blackout_days_in_range(splits):
    *_, info = splits
    assert 1 <= info["blackout_days"] <= 3


def test_zero_session_overlap(splits):
    train, val, test, _ = splits
    t, v, s = (set(df["session_id"]) for df in (train, val, test))
    assert not t & v and not v & s and not t & s


def test_split_info_has_num_items(splits):
    *_, info = splits
    assert info["num_items"] > 0
