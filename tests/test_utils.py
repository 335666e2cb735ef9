"""Utils tests (parity with reference tests/test_utils.py coverage)."""

import numpy as np
import pytest

from gat_recommendation_tpu.train.metrics import (
    compute_ndcg_at_k,
    compute_recall_at_k,
    compute_stratified_metrics,
)
from gat_recommendation_tpu.utils import load_json, save_json, set_seed, timer
from gat_recommendation_tpu.utils.io import load_config, save_config


def test_seed_reproducibility():
    set_seed(123)
    a = np.random.rand(5)
    set_seed(123)
    b = np.random.rand(5)
    np.testing.assert_array_equal(a, b)


def test_json_roundtrip(tmp_path):
    data = {"a": 1, "b": [1, 2, 3], "c": {"d": 0.5}, "n": np.int64(7)}
    path = tmp_path / "sub" / "x.json"
    save_json(data, path)
    loaded = load_json(path)
    assert loaded["a"] == 1 and loaded["n"] == 7


def test_yaml_roundtrip(tmp_path):
    cfg = {"model": "gat", "lr": 0.001}
    save_config(cfg, tmp_path / "c.yaml")
    assert load_config(tmp_path / "c.yaml") == cfg


def test_recall_at_k_hand_computed():
    preds = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]])
    targets = np.array([2, 9, 9])
    assert compute_recall_at_k(preds, targets, k=3) == pytest.approx(2 / 3)
    assert compute_recall_at_k(preds, targets, k=1) == pytest.approx(0.0)


def test_ndcg_at_k_hand_computed():
    preds = np.array([[1, 2, 3], [4, 5, 6]])
    targets = np.array([1, 6])
    # Target at pos 0 -> 1/log2(2)=1.0; pos 2 -> 1/log2(4)=0.5.
    assert compute_ndcg_at_k(preds, targets, k=3) == pytest.approx(0.75)


def test_ndcg_miss_is_zero():
    preds = np.array([[1, 2, 3]])
    targets = np.array([99])
    assert compute_ndcg_at_k(preds, targets, k=3) == 0.0


def test_stratified_metrics():
    preds = np.array([[1, 2], [3, 4], [5, 6], [7, 8]])
    targets = np.array([1, 4, 9, 9])
    strata = np.array([0, 0, 1, 1])
    res = compute_stratified_metrics(preds, targets, strata, k_values=[2])
    assert res["stratum_0"]["recall@2"] == pytest.approx(1.0)
    assert res["stratum_1"]["recall@2"] == pytest.approx(0.0)
    assert res["stratum_0"]["count"] == 2


def test_timer_records():
    results = {}
    with timer("op", results=results):
        sum(range(1000))
    assert results["op"] >= 0.0
