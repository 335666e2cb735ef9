"""Recommender + app wiring tests (parity with reference tests/serving/test_recommender.py).

A tiny real checkpoint is trained once per session (the reference skips unless
a 1.4GB artifact exists; here the checkpoint is small enough to build live).
App wiring also uses a FakeRecommender (reference :52-85 pattern), and one
test drives the actual stdlib HTTP server end-to-end.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from gat_recommendation_tpu.serving.app import handle_request, make_server, set_recommender
from gat_recommendation_tpu.serving.validation import ValidatedRequest

NUM_ITEMS = 120


@pytest.fixture(scope="module")
def trained_checkpoint(tmp_path_factory):
    """Train graph_transformer_optimized for 1 epoch, save a real checkpoint."""
    import jax
    import optax

    from gat_recommendation_tpu.data.batching import SessionDataset, iterate_batches
    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.train import Trainer
    from gat_recommendation_tpu.train.losses import dual_loss

    import pandas as pd

    rng = np.random.default_rng(0)
    rows = []
    for s in range(40):
        for t in range(int(rng.integers(3, 9))):
            rows.append((f"s{s}", t * 1000, int(rng.integers(1, NUM_ITEMS))))
    df = pd.DataFrame(rows, columns=["session_id", "timestamp", "itemid"])
    item_i = rng.integers(1, NUM_ITEMS, 200)
    item_j = rng.integers(1, NUM_ITEMS, 200)

    ds = SessionDataset(df, (item_i, item_j), num_items=NUM_ITEMS)
    model = create_model(
        "graph_transformer_optimized",
        num_items=NUM_ITEMS,
        embedding_dim=16,
        hidden_dim=16,
        laplacian_k=4,
    )
    out = tmp_path_factory.mktemp("ckpt")
    trainer = Trainer(
        model,
        train_batches=lambda e: iterate_batches(ds, batch_size=16, seed=e),
        val_batches=lambda: iterate_batches(ds, batch_size=16, shuffle=False),
        output_dir=out,
        max_epochs=1,
        loss_fn=dual_loss,
    )
    params, state, opt_state = trainer.init_state()
    state = model.precompute_pe(state, item_i, item_j)
    trainer.train(params, state, opt_state)

    edges_csv = out / "graph_edges.csv"
    pd.DataFrame({"item_i": item_i, "item_j": item_j}).to_csv(edges_csv, index=False)
    return out / "checkpoint_best", edges_csv


@pytest.fixture(scope="module")
def recommender(trained_checkpoint):
    from gat_recommendation_tpu.serving.recommender import Recommender

    ckpt, edges = trained_checkpoint
    return Recommender(ckpt, edges, buckets=(8, 16), warmup=False)


def test_topk_validity(recommender):
    v = ValidatedRequest(session_items=[1, 2, 3], k=10)
    items, scores = recommender.recommend(v)
    assert len(items) == 10 and len(scores) == 10
    assert all(0 < i < NUM_ITEMS for i in items)
    assert len(set(items)) == 10


def test_seen_items_excluded(recommender):
    session = [1, 2, 3, 4, 5]
    items, _ = recommender.recommend(ValidatedRequest(session_items=session, k=20))
    assert not set(items) & set(session)
    assert 0 not in items


def test_scores_descending(recommender):
    _, scores = recommender.recommend(ValidatedRequest(session_items=[7, 9], k=15))
    assert all(a >= b for a, b in zip(scores, scores[1:]))


def test_health(recommender):
    h = recommender.health()
    assert h["num_items"] == NUM_ITEMS
    assert h["embedding_dim"] == 16
    assert np.isfinite(h["val_recall_at_10"])


def test_rejects_ffn_checkpoint(trained_checkpoint, tmp_path):
    """FFN checkpoints must be refused (reference recommender.py:53-58)."""
    import jax

    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.serving.recommender import Recommender
    from gat_recommendation_tpu.train import checkpoint as ckpt

    model = create_model(
        "graph_transformer", num_items=50, embedding_dim=8, hidden_dim=8,
        num_heads=2, laplacian_k=2, use_ffn=True,
    )
    params, state = model.init_params(jax.random.key(0))
    from dataclasses import asdict

    ckpt.save(tmp_path / "ffn_ckpt", params, state, {"dummy": np.zeros(1)},
              {"epoch": 0, "best_val_metric": 0.0, "model_name": "graph_transformer",
               "model_config": asdict(model.config)})
    _, edges = trained_checkpoint
    with pytest.raises(RuntimeError, match="FFN"):
        Recommender(tmp_path / "ffn_ckpt", edges, warmup=False)


# ---------------------------------------------------------------------------
# App wiring with a fake recommender (no checkpoint needed)
# ---------------------------------------------------------------------------

class FakeRecommender:
    num_items = 50
    embedding_dim = 8
    checkpoint_epoch = 3
    val_recall_at_10 = 0.5

    def recommend(self, validated):
        k = validated.k
        return list(range(1, k + 1)), [1.0 / (i + 1) for i in range(k)]


@pytest.fixture
def fake_app():
    set_recommender(FakeRecommender())
    yield
    set_recommender(None)


def test_app_health_no_model():
    set_recommender(None)
    status, payload = handle_request("GET", "/health", None)
    assert status == 200
    assert payload["model_loaded"] is False


def test_app_recommend_503_without_model():
    set_recommender(None)
    status, _ = handle_request("POST", "/recommend", {"session_items": [1]})
    assert status == 503


def test_app_recommend_ok(fake_app):
    status, payload = handle_request("POST", "/recommend", {"session_items": [1, 2], "k": 5})
    assert status == 200
    assert payload["recommendations"] == [1, 2, 3, 4, 5]
    assert payload["latency_ms"] >= 0


def test_app_validation_errors(fake_app):
    assert handle_request("POST", "/recommend", {"session_items": []})[0] == 422
    assert handle_request("POST", "/recommend", {"session_items": [9999]})[0] == 422
    assert handle_request("POST", "/recommend", {"wrong": 1})[0] == 422
    assert handle_request("POST", "/recommend", {"session_items": "abc"})[0] == 422
    assert handle_request("POST", "/recommend", {"session_items": [1], "k": "x"})[0] == 422
    assert handle_request("GET", "/nope", None)[0] == 404


def test_http_server_end_to_end(fake_app):
    """Drive the real stdlib HTTP transport on a free port."""
    server = make_server(load_model=False)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            health = json.loads(r.read())
        assert health["model_loaded"] is True

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/recommend",
            data=json.dumps({"session_items": [3, 4], "k": 3}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            payload = json.loads(r.read())
        assert payload["recommendations"] == [1, 2, 3]

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/recommend", data=b"{not json", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(bad)
        assert err.value.code == 400
    finally:
        server.shutdown()


def test_int8_scoring_matches_exact(trained_checkpoint):
    """The int8 candidate path (native scorer + exact f32 re-rank) equals
    the exact jitted GEMV path when L >= catalog size (every row is a
    candidate, so membership cannot differ and the re-rank IS the exact
    ranking) — pins the serving wiring: seen-mask exclusion, padding/phantom
    exclusion via zeroed scales, score dtype."""
    from gat_recommendation_tpu.data import native
    from gat_recommendation_tpu.serving.recommender import Recommender

    if not native.available():
        pytest.skip("libbatcher.so unavailable")
    ckpt, edges = trained_checkpoint
    exact = Recommender(ckpt, edges, buckets=(8, 16), warmup=False, int8_scoring=False)
    fast = Recommender(ckpt, edges, buckets=(8, 16), warmup=False, int8_scoring=True)
    assert fast.int8_scoring and not exact.int8_scoring
    for items in ([1, 2, 3], [5], list(range(1, 12))):
        v = ValidatedRequest(session_items=items, k=10)
        items_a, scores_a = exact.recommend(v)
        items_b, scores_b = fast.recommend(v)
        np.testing.assert_allclose(scores_a, scores_b, rtol=1e-5, atol=1e-6)
        # ordering may legitimately differ only at exact score ties
        assert set(items_a) == set(items_b) or np.allclose(
            sorted(scores_a), sorted(scores_b)
        )
        for it in items:  # seen items masked on both paths
            assert it not in items_b
