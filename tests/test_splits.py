"""Split-contract tests against real pipeline outputs.

Parity with reference tests/test_splits.py: no temporal leakage including
the blackout margin, blackout days in range, zero session overlap across
splits. Parametrized over every corpus present in the repo — `data/` (local
`make data`) and the committed reference-scale corpus `data_refscale/` —
so the committed corpus is exercised in CI, not just stored.
"""

import json
from pathlib import Path

import pandas as pd
import pytest

ROOT = Path(__file__).parent.parent
_REQUIRED = ("split_info.json", "train.csv", "val.csv", "test.csv")
_PARAMS = [
    d / "processed"
    for d in (ROOT / "data", ROOT / "data_refscale")
    if all((d / "processed" / f).exists() for f in _REQUIRED)
]

pytestmark = pytest.mark.skipif(
    not _PARAMS, reason="no split outputs anywhere (run `make data`)"
)


@pytest.fixture(scope="module", params=_PARAMS, ids=lambda d: d.parent.name)
def splits(request):
    processed = request.param
    return (
        pd.read_csv(processed / "train.csv"),
        pd.read_csv(processed / "val.csv"),
        pd.read_csv(processed / "test.csv"),
        json.loads((processed / "split_info.json").read_text()),
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
