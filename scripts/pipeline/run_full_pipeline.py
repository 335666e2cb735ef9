#!/usr/bin/env python3
"""Full-pipeline validation on a session subset (reference scripts/pipeline/run_full_pipeline.py parity).

Takes a subset of real (or synthetic) data, trains all 4 models for a few
epochs with the listwise loss, validates finiteness + eval metrics, writes a
results JSON; exit code gates the DVC validate stage.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

from gat_recommendation_tpu.utils.io import save_json
from gat_recommendation_tpu.utils.logging import get_logger
from gat_recommendation_tpu.utils.seed import set_seed

MODELS = ["graphsage", "gat", "graph_transformer", "graph_transformer_optimized"]


def main() -> None:
    parser = argparse.ArgumentParser(description="Validate all models on a data subset")
    parser.add_argument("--train-sessions", type=str, default="data/processed/train.csv")
    parser.add_argument("--graph-edges", type=str, default="data/processed/graph_edges.csv")
    parser.add_argument("--num-sessions", type=int, default=100)
    parser.add_argument("--num-epochs", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--results-file", type=str, default="outputs/pipeline_validation.json")
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()

    logger = get_logger(__name__)
    set_seed(args.seed)

    import jax
    import optax

    from gat_recommendation_tpu.data.batching import SessionDataset, iterate_batches, to_device
    from gat_recommendation_tpu.data.graph import load_edges
    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.train.losses import listwise_loss
    from gat_recommendation_tpu.train.trainer import make_eval_step, make_train_step

    sessions = pd.read_csv(args.train_sessions)
    subset_ids = sessions["session_id"].drop_duplicates().head(args.num_sessions)
    subset = sessions[sessions["session_id"].isin(subset_ids)]
    edges = load_edges(args.graph_edges)
    ds = SessionDataset(subset, edges)
    logger.info(f"Subset: {len(ds)} sessions, num_items={ds.num_items:,}")

    results: dict = {"num_sessions": len(ds), "models": {}}
    all_ok = True
    for name in MODELS:
        t0 = time.perf_counter()
        try:
            kwargs: dict = dict(embedding_dim=64, hidden_dim=64)
            if name.startswith("graph_transformer"):
                kwargs["laplacian_k"] = 8
            model = create_model(name, ds.num_items, **kwargs)
            params, state = model.init_params(jax.random.key(args.seed))
            if model.uses_laplacian_pe:
                state = model.precompute_pe(state, *edges)
            optimizer = optax.adamw(1e-3)
            opt_state = optimizer.init(params)
            step = make_train_step(model, listwise_loss, optimizer)

            losses = []
            for epoch in range(args.num_epochs):
                for i, hb in enumerate(
                    iterate_batches(ds, batch_size=args.batch_size, seed=epoch)
                ):
                    params, state, opt_state, loss = step(
                        params, state, opt_state, to_device(hb), jax.random.key(epoch * 1000 + i)
                    )
                    losses.append(float(loss))

            eval_step = make_eval_step(model, 10)
            preds, targets = [], []
            for hb in iterate_batches(ds, batch_size=args.batch_size, shuffle=False):
                top = np.asarray(eval_step(params, state, to_device(hb)))
                m = np.asarray(hb.sample_mask)
                preds.append(top[m])
                targets.append(np.asarray(hb.targets)[m])
            from gat_recommendation_tpu.train.metrics import compute_recall_at_k

            recall10 = compute_recall_at_k(np.concatenate(preds), np.concatenate(targets), 10)
            ok = all(np.isfinite(losses)) and losses[-1] < losses[0] * 1.5
            results["models"][name] = {
                "pass": bool(ok),
                "first_loss": losses[0],
                "last_loss": losses[-1],
                "recall@10": recall10,
                "seconds": time.perf_counter() - t0,
            }
            all_ok &= ok
            logger.info(
                f"{name}: loss {losses[0]:.4f}->{losses[-1]:.4f}, recall@10={recall10:.4f} "
                f"({results['models'][name]['seconds']:.1f}s) {'PASS' if ok else 'FAIL'}"
            )
        except Exception as e:
            results["models"][name] = {"pass": False, "error": str(e)}
            all_ok = False
            logger.error(f"{name}: FAIL ({e})")

    results["pass"] = bool(all_ok)
    Path(args.results_file).parent.mkdir(parents=True, exist_ok=True)
    save_json(results, args.results_file)
    logger.info(f"Pipeline validation {'PASSED' if all_ok else 'FAILED'} -> {args.results_file}")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
