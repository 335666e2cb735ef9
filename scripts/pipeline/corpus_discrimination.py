#!/usr/bin/env python3
"""Corpus discrimination probe: do the four model families separate on a
given synthetic corpus?

The reference's central empirical claim is an ORDERING — optimized Graph
Transformer >> GAT >> GraphSAGE on RetailRocket recall@10
(/root/reference/docs/EXPERIMENTS.md:38-41). A corpus can only validate
that claim if it discriminates between the architectures; the
independent-draws parity generator does not (every model converges to the
popularity solution). This probe trains all four models on a structured
corpus (data/synthetic.generate_structured_events) and reports best
recall@10, best epoch, the full trajectory, and the popularity baseline —
the evidence docs/EXPERIMENTS.md's reference-scale study is built on.

Example (medium probe, TPU):
    python scripts/pipeline/corpus_discrimination.py \
        --num-sessions 60000 --num-items 60000 --num-active 10000 \
        --num-clusters 100 --max-epochs 70 --patience 15
"""

import argparse
import json
import time
from pathlib import Path

import numpy as np


def bootstrap_ci(hits: np.ndarray, n_boot: int = 2000, seed: int = 0) -> tuple[float, float]:
    """95% bootstrap CI of a Bernoulli mean (per-session hit vector)."""
    rng = np.random.default_rng(seed)
    n = len(hits)
    idx = rng.integers(0, n, size=(n_boot, n))
    means = hits[idx].mean(axis=1)
    return float(np.quantile(means, 0.025)), float(np.quantile(means, 0.975))


def paired_margin_ci(
    hits_a: np.ndarray, hits_b: np.ndarray, n_boot: int = 2000, seed: int = 0
) -> dict:
    """Paired bootstrap over sessions for recall(a) - recall(b).

    The two models are evaluated on the SAME val sessions, so per-session
    hits are correlated; resampling sessions jointly gives a much tighter
    (and honest) CI on the margin than differencing two independent CIs.
    An ordering claim is only 'resolved' when the 95% CI excludes zero.
    """
    rng = np.random.default_rng(seed)
    n = len(hits_a)
    diff = hits_a.astype(np.float64) - hits_b.astype(np.float64)
    idx = rng.integers(0, n, size=(n_boot, n))
    margins = diff[idx].mean(axis=1)
    lo, hi = float(np.quantile(margins, 0.025)), float(np.quantile(margins, 0.975))
    return {
        "margin": float(diff.mean()),
        "ci95": [round(lo, 5), round(hi, 5)],
        "resolved": bool(lo > 0 or hi < 0),
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-sessions", type=int, default=30_000)
    p.add_argument("--num-items", type=int, default=60_000)
    p.add_argument("--num-active", type=int, default=None)
    p.add_argument("--num-clusters", type=int, default=None)
    p.add_argument("--noise-prob", type=float, default=0.15)
    p.add_argument("--repeat-prob", type=float, default=0.25)
    p.add_argument("--successors-per-item", type=int, default=8)
    p.add_argument("--cross-cluster-successors", type=int, default=2)
    p.add_argument("--dirichlet-alpha", type=float, default=0.4)
    p.add_argument("--mean-session-length", type=int, default=8)
    p.add_argument("--pop-exponent", type=float, default=1.05)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--max-epochs", type=int, default=40)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--embedding-dim", type=int, default=256)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--models", nargs="+", default=[
        "graph_transformer_optimized", "graph_transformer", "gat", "graphsage",
    ])
    p.add_argument("--output-dir", type=str, default="outputs/discrimination")
    args = p.parse_args()

    from gat_recommendation_tpu.data import (
        build_co_event_graph,
        create_temporal_splits,
        generate_structured_events,
        sessionize_events,
    )
    from gat_recommendation_tpu.data.batching import SessionDataset, iterate_batches
    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.train.losses import create_loss_function
    from gat_recommendation_tpu.train.trainer import Trainer
    from gat_recommendation_tpu.utils import enable_persistent_cache
    from gat_recommendation_tpu.utils.logging import get_logger

    logger = get_logger(__name__)
    enable_persistent_cache()

    t0 = time.time()
    events = generate_structured_events(
        num_sessions=args.num_sessions, num_items=args.num_items, seed=args.seed,
        num_active=args.num_active, num_clusters=args.num_clusters,
        noise_prob=args.noise_prob, repeat_prob=args.repeat_prob,
        successors_per_item=args.successors_per_item,
        cross_cluster_successors=args.cross_cluster_successors,
        dirichlet_alpha=args.dirichlet_alpha,
        mean_session_length=args.mean_session_length,
        pop_exponent=args.pop_exponent,
    )
    sessions = sessionize_events(events)
    train_df, val_df, _test_df, info = create_temporal_splits(sessions)
    edges_df, gstats = build_co_event_graph(train_df)
    edges = (edges_df["item_i"].to_numpy("int64"), edges_df["item_j"].to_numpy("int64"))
    num_items = info["num_items"]
    train_ds = SessionDataset(train_df, edges, num_negatives=5, num_items=num_items)
    val_ds = SessionDataset(val_df, edges, num_negatives=5, num_items=num_items)
    logger.info(
        f"[{time.time() - t0:.1f}s] {len(train_ds)}/{len(val_ds)} train/val sessions, "
        f"graph {gstats['num_nodes']} nodes / {gstats['num_edges']} edges"
    )

    # Popularity baseline — must stay weak for the probe to mean anything.
    pop = train_df.groupby("itemid").size().sort_values(ascending=False)
    val_targets = (
        val_df.sort_values(["session_id", "timestamp"]).groupby("session_id")["itemid"].last()
    )
    baselines = {
        f"popularity_recall@{k}": float(np.mean([t in set(pop.index[:k]) for t in val_targets]))
        for k in (10, 20)
    }
    logger.info(f"baselines: {baselines}")

    out_root = Path(args.output_dir)
    results: dict = {"config": vars(args), "baselines": baselines, "models": {}}
    best_hits: dict[str, np.ndarray] = {}
    for name in args.models:
        t0 = time.time()
        model = create_model(
            name, num_items=num_items,
            embedding_dim=args.embedding_dim, hidden_dim=args.embedding_dim,
        )
        mk = lambda ds, shuffle: lambda epoch=0: iterate_batches(  # noqa: E731
            ds, batch_size=args.batch_size, shuffle=shuffle, seed=epoch if shuffle else 0
        )
        trainer = Trainer(
            model,
            train_batches=mk(train_ds, True),
            val_batches=mk(val_ds, False),
            max_epochs=args.max_epochs,
            eval_every=1,
            patience=args.patience,
            checkpoint_every=10**9,  # probe: skip the heavy latest-saves
            output_dir=out_root / name,
            k_values=[10, 20],
            loss_fn=create_loss_function("dual", 0.7),
            sparse_embedding_grads=True,
            chain=16,
            record_hits=True,
        )
        params, state, opt_state = trainer.init_state()
        if model.uses_laplacian_pe:
            state = model.precompute_pe(state, *edges)
        trainer.train(params, state, opt_state)
        r10 = [m["recall@10"] for m in trainer.history["val_metrics"]]
        best = int(np.argmax(r10))
        hits = np.asarray(trainer.hits[best], dtype=np.int8)
        best_hits[name] = hits
        lo, hi = bootstrap_ci(hits)
        results["models"][name] = {
            "best_recall@10": r10[best],
            "ci95": [round(lo, 5), round(hi, 5)],
            "best_epoch": best,
            "epochs_run": len(r10),
            "seconds": round(time.time() - t0, 1),
            "trajectory_recall@10": [round(x, 4) for x in r10],
        }
        logger.info(
            f"== {name}: best r@10 {r10[best]:.4f} [{lo:.4f}, {hi:.4f}] @ epoch {best}"
        )

    order = sorted(results["models"], key=lambda k: -results["models"][k]["best_recall@10"])
    results["order"] = order
    # Paired bootstrap on every model pair: an ordering edge only counts as
    # settled when the margin CI excludes 0 (advisor r3: 0.003-0.007 margins
    # on ~2,360 sessions are inside sampling noise).
    pairs: dict = {}
    names = list(best_hits)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            pairs[f"{a} - {b}"] = paired_margin_ci(best_hits[a], best_hits[b])
    results["pairwise_margins"] = pairs
    unresolved = [k for k, v in pairs.items() if not v["resolved"]]
    results["unresolved_pairs"] = unresolved
    out_root.mkdir(parents=True, exist_ok=True)
    (out_root / "results.json").write_text(json.dumps(results, indent=2))
    logger.info("ORDER: " + " > ".join(order))
    for k, v in pairs.items():
        tag = "SETTLED" if v["resolved"] else "UNRESOLVED (CI contains 0)"
        logger.info(f"   {k}: {v['margin']:+.4f} {v['ci95']} {tag}")


if __name__ == "__main__":
    main()
