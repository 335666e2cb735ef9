"""Dev + Vertex server tests (parity with reference tests/test_serving.py coverage)."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

SERVE_DIR = Path(__file__).parent.parent / "scripts" / "serve"


def _load(name: str, path: Path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def dev():
    sys.path.insert(0, str(SERVE_DIR))
    return _load("dev_app", SERVE_DIR / "app.py")


@pytest.fixture(scope="module")
def model(dev):
    return dev.MeanEmbeddingModel.demo(num_items=200, dim=16)


def test_health(dev, model):
    status, payload = dev.handle(model, "GET", "/health", None)
    assert status == 200 and payload["model_loaded"] and payload["num_items"] == 200


def test_recommend_shape_and_seen_exclusion(dev, model):
    status, payload = dev.handle(model, "POST", "/recommend", {"session_items": [1, 2, 3], "k": 7})
    assert status == 200
    assert len(payload["recommendations"]) == 7
    assert not set(payload["recommendations"]) & {0, 1, 2, 3}
    # scores descending
    s = payload["scores"]
    assert all(a >= b for a, b in zip(s, s[1:]))


def test_recommend_errors(dev, model):
    assert dev.handle(model, "POST", "/recommend", {"session_items": []})[0] == 400
    assert dev.handle(model, "POST", "/recommend", {})[0] == 400
    assert dev.handle(model, "POST", "/recommend", {"session_items": [9999]})[0] == 400
    assert dev.handle(model, "GET", "/nope", None)[0] == 404


def test_batch_endpoint(dev, model):
    status, payload = dev.handle(
        model, "POST", "/recommend/batch", {"sessions": [[1, 2], [5], [99999]], "k": 3}
    )
    assert status == 200
    assert len(payload["results"]) == 3
    assert "recommendations" in payload["results"][0]
    assert "error" in payload["results"][2]


def test_mean_embedding_semantics(dev):
    """Session embedding must be the mean of valid item embeddings, cosine-scored."""
    emb = np.eye(6, dtype=np.float32)
    m = dev.MeanEmbeddingModel(emb)
    recs, scores = m.recommend([1, 2], k=2)
    # Session = mean of e1,e2; cosine with e1/e2 masked -> all others score 0.
    assert set(recs).isdisjoint({0, 1, 2})
    assert np.allclose(scores, 0.0, atol=1e-6)


@pytest.fixture(scope="module")
def vertex(dev, monkeypatch_module_env):
    return _load("vertex_app_mod", SERVE_DIR / "vertex_app.py")


@pytest.fixture(scope="module")
def monkeypatch_module_env():
    import os

    os.environ["INFERENCE_MODE"] = "demo"
    yield
    os.environ.pop("INFERENCE_MODE", None)


def test_vertex_predict_instances(vertex):
    model = vertex.load_model()
    status, payload = vertex.handle(
        model, "POST", "/predict",
        {"instances": [{"session_items": [1, 2], "k": 3}, {"session_items": [], "k": 3}]},
    )
    assert status == 200
    preds = payload["predictions"]
    assert len(preds) == 2
    assert len(preds[0]["recommendations"]) == 3
    assert "error" in preds[1]


def test_vertex_health_metrics_drift(vertex):
    model = vertex.load_model()
    assert vertex.handle(model, "GET", "/health", None)[0] == 200
    status, metrics_bytes = vertex.handle(model, "GET", "/metrics", None)
    assert status == 200 and isinstance(metrics_bytes, bytes)
    status, report = vertex.handle(model, "GET", "/drift", None)
    assert status == 200
    assert "score_ks_statistic" in report and "top1_item_entropy" in report


def test_drift_detector_detects_shift():
    from gat_recommendation_tpu.serving.monitoring import DriftDetector

    d = DriftDetector(reference_size=100, window_size=100, threshold=0.2)
    rng = np.random.default_rng(0)
    for _ in range(100):
        d.record(float(rng.normal(0, 1)), int(rng.integers(2, 10)), int(rng.integers(1, 5)))
    for _ in range(100):
        d.record(float(rng.normal(5, 1)), int(rng.integers(2, 10)), int(rng.integers(1, 5)))
    rep = d.report()
    assert rep["sufficient_data"]
    assert rep["score_drift_detected"] is True
    assert rep["length_drift_detected"] is False
    assert rep["top1_item_entropy"] > 0
