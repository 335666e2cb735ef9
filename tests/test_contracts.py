"""Data-contract tests against real pipeline outputs.

Parity with reference tests/test_contracts.py, parametrized over every
corpus present in the repo: `data/` (local `make data` runs) and the
committed reference-scale corpus `data_refscale/` — the committed corpus
must buy CI coverage, not just repo weight (advisor r3). Sessions come from
interim/sessions.csv where present, else from the concatenated processed
splits (the interim CSV is seeded-regenerable and untracked at reference
scale).
"""

from pathlib import Path

import pandas as pd
import pytest

ROOT = Path(__file__).parent.parent
DATA_DIRS = [d for d in (ROOT / "data", ROOT / "data_refscale") if d.exists()]


def _sessions_source(data_dir: Path) -> Path | list[Path] | None:
    interim = data_dir / "interim" / "sessions.csv"
    if interim.exists():
        return interim
    splits = [data_dir / "processed" / f"{n}.csv" for n in ("train", "val", "test")]
    if all(p.exists() for p in splits):
        return splits
    return None


_PARAMS = [d for d in DATA_DIRS if _sessions_source(d) is not None]

pytestmark = pytest.mark.skipif(
    not _PARAMS, reason="no pipeline outputs anywhere (run `make data`)"
)


@pytest.fixture(scope="module", params=_PARAMS, ids=lambda d: d.name)
def sessions(request):
    src = _sessions_source(request.param)
    if isinstance(src, list):
        return pd.concat([pd.read_csv(p) for p in src], ignore_index=True)
    return pd.read_csv(src)


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
