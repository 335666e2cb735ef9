"""Checkpoint layer: roundtrip, leaf-path manifest verification, partial restore."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from gat_recommendation_tpu.train import checkpoint as ckpt


def _trees():
    params = {"item_embedding": jnp.arange(12.0).reshape(4, 3), "proj": {"w": jnp.ones((3, 2))}}
    state = {"bn": {"mean": jnp.zeros(3), "var": jnp.ones(3)}}
    opt_state = {"count": jnp.zeros((), jnp.int32), "mu": {"item_embedding": jnp.zeros((4, 3)), "proj": {"w": jnp.zeros((3, 2))}}}
    return params, state, opt_state


def test_roundtrip(tmp_path):
    params, state, opt_state = _trees()
    ckpt.save(tmp_path / "c", params, state, opt_state, {"epoch": 3})
    p2, s2, o2, meta = ckpt.restore(tmp_path / "c", params, state, opt_state)
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(np.asarray(p2["item_embedding"]), np.asarray(params["item_embedding"]))
    np.testing.assert_array_equal(np.asarray(o2["mu"]["proj"]["w"]), 0.0)
    assert "leaf_paths" in meta and len(meta["leaf_paths"]) == 7


def test_renamed_key_fails_loudly(tmp_path):
    """Regression (VERDICT r1 weak #5): a renamed top-level key must raise,
    not silently misalign every array."""
    params, state, opt_state = _trees()
    ckpt.save(tmp_path / "c", params, state, opt_state, {"epoch": 0})
    bad_params = {"item_embedding": params["item_embedding"], "projection": {"w": jnp.ones((3, 2))}}
    with pytest.raises(ValueError, match="manifest mismatch"):
        ckpt.restore(tmp_path / "c", bad_params, state, opt_state)


def test_restore_params_state_uses_manifest(tmp_path):
    params, state, opt_state = _trees()
    ckpt.save(tmp_path / "c", params, state, opt_state, {"epoch": 0})
    p2, s2 = ckpt.restore_params_state(tmp_path / "c", params, state)
    np.testing.assert_array_equal(np.asarray(p2["proj"]["w"]), 1.0)
    np.testing.assert_array_equal(np.asarray(s2["bn"]["var"]), 1.0)

    # Mismatched template => loud failure.
    with pytest.raises(ValueError):
        ckpt.restore_params_state(tmp_path / "c", {"wrong": jnp.zeros(1)}, state)


def test_deferred_best_checkpoint_matches_eager(tmp_path):
    """defer_best=True (device-side best snapshot, one persist at end) must
    produce the same checkpoint_best as the eager write-per-improvement
    policy: identical arrays, identical best-epoch meta."""
    import pandas as pd

    from gat_recommendation_tpu.data.batching import SessionDataset, iterate_batches
    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.train.trainer import Trainer

    rng = np.random.default_rng(3)
    rows = []
    for s in range(30):
        for t in range(int(rng.integers(3, 8))):
            rows.append((f"s{s:02d}", t * 1000, int(rng.integers(1, 40))))
    df = pd.DataFrame(rows, columns=["session_id", "timestamp", "itemid"])
    edges = (rng.integers(1, 40, 80), rng.integers(1, 40, 80))
    ds = SessionDataset(df, edges)

    runs = {}
    for defer in (False, True):
        model = create_model(
            "graphsage", num_items=ds.num_items, embedding_dim=8, hidden_dim=8, dropout=0.0
        )
        trainer = Trainer(
            model,
            train_batches=lambda epoch: iterate_batches(ds, 8, shuffle=True, seed=epoch),
            val_batches=lambda: iterate_batches(ds, 8),
            output_dir=tmp_path / f"defer_{defer}",
            max_epochs=3,
            eval_every=1,
            defer_best=defer,
        )
        history = trainer.train()
        meta = json.loads((tmp_path / f"defer_{defer}" / "checkpoint_best" / "meta.json").read_text())
        r10 = [m["recall@10"] for m in history["val_metrics"]]
        assert meta["epoch"] == int(np.argmax(r10))
        p, s = ckpt.restore_params_state(
            tmp_path / f"defer_{defer}" / "checkpoint_best", *trainer.init_state()[:2]
        )
        runs[defer] = (meta["epoch"], p)

    assert runs[True][0] == runs[False][0]
    eager, deferred = runs[False][1], runs[True][1]
    import jax

    for (path_a, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(eager), jax.tree_util.tree_leaves_with_path(deferred)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path_a))


def test_restore_params_state_legacy_checkpoint(tmp_path):
    """Pre-manifest checkpoints restore via the dict-sort-order fallback."""
    params, state, opt_state = _trees()
    ckpt.save(tmp_path / "c", params, state, opt_state, {"epoch": 0})
    meta_path = tmp_path / "c" / "meta.json"
    meta = json.loads(meta_path.read_text())
    del meta["leaf_paths"]
    meta_path.write_text(json.dumps(meta))
    p2, s2 = ckpt.restore_params_state(tmp_path / "c", params, state)
    np.testing.assert_array_equal(
        np.asarray(p2["item_embedding"]), np.asarray(params["item_embedding"])
    )


def test_hits_io_roundtrip(tmp_path):
    """Packed-bit hit storage: ragged rows and None (unknown) rows survive."""
    from gat_recommendation_tpu.train.hits_io import load_hits, save_hits

    rows = [
        np.array([1, 0, 1, 1, 0, 0, 0, 1, 1], dtype=np.int8),
        None,
        np.array([0, 1], dtype=np.int8),
        np.zeros(0, dtype=np.int8),
    ]
    save_hits(tmp_path / "h.npz", rows)
    back = load_hits(tmp_path / "h.npz")
    assert back[1] is None
    np.testing.assert_array_equal(back[0], rows[0])
    np.testing.assert_array_equal(back[2], rows[2])
    assert len(back[3]) == 0


def _tiny_dataset(seed=3):
    import pandas as pd

    from gat_recommendation_tpu.data.batching import SessionDataset

    rng = np.random.default_rng(seed)
    rows = []
    for s in range(30):
        for t in range(int(rng.integers(3, 8))):
            rows.append((f"s{s:02d}", t * 1000, int(rng.integers(1, 40))))
    df = pd.DataFrame(rows, columns=["session_id", "timestamp", "itemid"])
    edges = (rng.integers(1, 40, 80), rng.integers(1, 40, 80))
    return SessionDataset(df, edges)


def test_record_hits_sidecar_not_in_history(tmp_path):
    """record_hits persists packed bits in hits_k10.npz; history.json stays
    hit-free (VERDICT r4 weak #4: 14 MB JSON int lists per run)."""
    from gat_recommendation_tpu.data.batching import iterate_batches
    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.train.hits_io import load_hits
    from gat_recommendation_tpu.train.trainer import Trainer

    ds = _tiny_dataset()
    model = create_model("graphsage", num_items=ds.num_items, embedding_dim=8, hidden_dim=8, dropout=0.0)
    trainer = Trainer(
        model,
        train_batches=lambda epoch: iterate_batches(ds, 8, shuffle=True, seed=epoch),
        val_batches=lambda: iterate_batches(ds, 8),
        output_dir=tmp_path,
        max_epochs=3,
        eval_every=1,
        record_hits=True,
    )
    history = trainer.train()
    assert not any(k.startswith("val_hits") for k in history)
    hist_on_disk = json.loads((tmp_path / "history.json").read_text())
    assert not any(k.startswith("val_hits") for k in hist_on_disk)
    rows = load_hits(tmp_path / "hits_k10.npz")
    assert len(rows) == len(history["val_metrics"])
    n_val = len(rows[0])
    # recall@10 recomputed from the stored bits must match the history value.
    for row, m in zip(rows, history["val_metrics"]):
        assert len(row) == n_val
        assert float(row.mean()) == pytest.approx(m["recall@10"], abs=1e-6)


def test_record_hits_resume_alignment(tmp_path):
    """Resume from a checkpoint written WITHOUT record_hits: the hits list
    pads with None so row i still aligns with val_metrics[i] (ADVICE r4)."""
    from gat_recommendation_tpu.data.batching import iterate_batches
    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.train.hits_io import load_hits
    from gat_recommendation_tpu.train.trainer import Trainer

    ds = _tiny_dataset()

    def make_trainer(record_hits, max_epochs):
        model = create_model(
            "graphsage", num_items=ds.num_items, embedding_dim=8, hidden_dim=8, dropout=0.0
        )
        return Trainer(
            model,
            train_batches=lambda epoch: iterate_batches(ds, 8, shuffle=True, seed=epoch),
            val_batches=lambda: iterate_batches(ds, 8),
            output_dir=tmp_path,
            max_epochs=max_epochs,
            eval_every=1,
            record_hits=record_hits,
        )

    make_trainer(False, 2).train()
    t2 = make_trainer(True, 4)
    history = t2.train(resume=True)
    assert len(history["val_metrics"]) == 4
    rows = load_hits(tmp_path / "hits_k10.npz")
    assert len(rows) == 4
    assert rows[0] is None and rows[1] is None
    for i in (2, 3):
        assert float(rows[i].mean()) == pytest.approx(
            history["val_metrics"][i]["recall@10"], abs=1e-6
        )


def test_resume_without_record_hits_preserves_legacy_hits(tmp_path):
    """Resuming a legacy (round-4) checkpoint whose history carries JSON
    val_hits WITHOUT --record-hits must convert them to the packed sidecar,
    not destroy them when history.json is rewritten (code-review r5)."""
    from gat_recommendation_tpu.data.batching import iterate_batches
    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.train.hits_io import load_hits
    from gat_recommendation_tpu.train.trainer import Trainer

    ds = _tiny_dataset()

    def make_trainer(record_hits, max_epochs):
        model = create_model(
            "graphsage", num_items=ds.num_items, embedding_dim=8, hidden_dim=8, dropout=0.0
        )
        return Trainer(
            model,
            train_batches=lambda epoch: iterate_batches(ds, 8, shuffle=True, seed=epoch),
            val_batches=lambda: iterate_batches(ds, 8),
            output_dir=tmp_path,
            max_epochs=max_epochs,
            eval_every=1,
            record_hits=record_hits,
        )

    t1 = make_trainer(True, 2)
    t1.train()
    # Forge the legacy layout: hits back inside checkpoint meta/history,
    # no sidecar on disk.
    legacy_rows = [list(map(int, r)) for r in load_hits(tmp_path / "hits_k10.npz")]
    (tmp_path / "hits_k10.npz").unlink()
    meta_path = tmp_path / "checkpoint_latest" / "meta.json"
    meta = json.loads(meta_path.read_text())
    meta["history"]["val_hits@10"] = legacy_rows
    meta_path.write_text(json.dumps(meta))

    t2 = make_trainer(False, 4)  # record_hits OFF — the destructive case
    history = t2.train(resume=True)
    assert not any(k.startswith("val_hits") for k in history)
    rows = load_hits(tmp_path / "hits_k10.npz")  # sidecar restored the vectors
    assert len(rows) == 2
    np.testing.assert_array_equal(rows[0], np.asarray(legacy_rows[0], np.int8))
