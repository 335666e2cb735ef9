"""Data-contract tests against real pipeline outputs (skip-if-absent).

Parity with reference tests/test_contracts.py: these only run where the data
pipeline has produced data/interim/sessions.csv etc. (e.g. after `make data`).
"""

from pathlib import Path

import pandas as pd
import pytest

DATA = Path(__file__).parent.parent / "data"
SESSIONS = DATA / "interim" / "sessions.csv"

pytestmark = pytest.mark.skipif(
    not SESSIONS.exists(), reason="pipeline outputs absent (run `make data`)"
)


@pytest.fixture(scope="module")
def sessions():
    return pd.read_csv(SESSIONS)


def test_schema(sessions):
    required = {"timestamp", "visitorid", "event", "itemid", "session_id"}
    assert required.issubset(sessions.columns)
    assert pd.api.types.is_integer_dtype(sessions["timestamp"])
    assert pd.api.types.is_integer_dtype(sessions["itemid"])
    assert set(sessions["event"].unique()).issubset({"view", "addtocart", "transaction"})
    assert sessions["session_id"].notna().all()
    assert sessions["itemid"].notna().all()


def test_timestamps_monotonic_within_session(sessions):
    diffs = sessions.groupby("session_id")["timestamp"].diff().dropna()
    assert (diffs >= 0).all()


def test_min_session_length(sessions):
    assert (sessions.groupby("session_id").size() >= 3).all()
