#!/usr/bin/env python3
"""Evaluate saved checkpoints on the test split (reference scripts/evaluate_local.py parity).

Loads checkpoint meta (model_config) instead of the reference's hardcoded
MODEL_CONFIGS table; emits a summary table + evaluation_results.json.
"""

import argparse
import json
from pathlib import Path

import numpy as np

from gat_recommendation_tpu.data.batching import (
    SessionDataset,
    chain_iterator,
    iterate_batches,
    stack_batches,
    to_device,
)
from gat_recommendation_tpu.data.graph import load_edges
from gat_recommendation_tpu.models import create_model
from gat_recommendation_tpu.train import checkpoint as ckpt
from gat_recommendation_tpu.train.metrics import compute_ndcg_at_k, compute_recall_at_k
from gat_recommendation_tpu.train.trainer import make_chained_eval_step, make_eval_step
from gat_recommendation_tpu.utils.io import save_json
from gat_recommendation_tpu.utils.logging import get_logger

CHAIN = 16  # eval batches per dispatch (relay round-trip amortization)


def evaluate_checkpoint(ckpt_dir: Path, test_ds, batch_size: int, k_values: list[int]) -> dict:
    meta = ckpt.load_meta(ckpt_dir)
    cfg = dict(meta["model_config"])
    num_items = cfg.pop("num_items")
    model = create_model(meta["model_name"], num_items, **cfg)
    import jax

    p_tmpl, s_tmpl = model.init_params(jax.random.key(0))
    params, state = ckpt.restore_params_state(ckpt_dir, p_tmpl, s_tmpl)

    # Chained eval (trainer.make_chained_eval_step): full same-bucket groups
    # run CHAIN batches per dispatch; partial groups fall back per batch.
    eval_step = make_eval_step(model, max(k_values))
    chained = make_chained_eval_step(model, max(k_values))
    preds, targets = [], []

    def take(top, batch):
        mask = np.asarray(batch.sample_mask)
        preds.append(np.asarray(top)[mask])
        targets.append(np.asarray(batch.targets)[mask])

    batches = iterate_batches(test_ds, batch_size=batch_size, shuffle=False)
    for group in chain_iterator(batches, CHAIN):
        if len(group) < CHAIN:
            for batch in group:
                take(eval_step(params, state, to_device(batch)), batch)
            continue
        tops = np.asarray(chained(params, state, to_device(stack_batches(group))))
        for top, batch in zip(tops, group):
            take(top, batch)
    predictions = np.concatenate(preds)
    targets_arr = np.concatenate(targets)

    metrics = {"num_sessions": int(len(targets_arr)), "epoch": meta["epoch"]}
    for k in k_values:
        metrics[f"recall@{k}"] = compute_recall_at_k(predictions, targets_arr, k)
        metrics[f"ndcg@{k}"] = compute_ndcg_at_k(predictions, targets_arr, k)
    return metrics


def main() -> None:
    parser = argparse.ArgumentParser(description="Evaluate checkpoints on the test split")
    parser.add_argument("--test-sessions", type=str, default="data/processed/test.csv")
    parser.add_argument("--graph-edges", type=str, default="data/processed/graph_edges.csv")
    parser.add_argument("--outputs-dir", type=str, default="outputs")
    parser.add_argument("--which", type=str, default="best", choices=["best", "latest"])
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--k-values", type=int, nargs="+", default=[10, 20])
    parser.add_argument("--results-file", type=str, default="outputs/evaluation_results.json")
    args = parser.parse_args()

    logger = get_logger(__name__)
    split_info = json.loads(
        (Path(args.test_sessions).parent / "split_info.json").read_text()
    )
    edges = load_edges(args.graph_edges)
    test_ds = SessionDataset(args.test_sessions, edges, num_items=split_info["num_items"])

    results = {}
    for model_dir in sorted(Path(args.outputs_dir).iterdir()):
        ckpt_dir = model_dir / f"checkpoint_{args.which}"
        if not (ckpt_dir / "meta.json").exists():
            continue
        logger.info(f"Evaluating {model_dir.name} ({args.which})...")
        try:
            results[model_dir.name] = evaluate_checkpoint(
                ckpt_dir, test_ds, args.batch_size, args.k_values
            )
        except Exception as e:
            logger.error(f"{model_dir.name}: {e}")
            results[model_dir.name] = {"error": str(e)}

    logger.info(f"{'model':32s} " + " ".join(f"{'r@%d' % k:>8s} {'n@%d' % k:>8s}" for k in args.k_values))
    for name, m in results.items():
        if "error" in m:
            logger.info(f"{name:32s} ERROR: {m['error']}")
        else:
            row = " ".join(
                f"{m[f'recall@{k}']:8.4f} {m[f'ndcg@{k}']:8.4f}" for k in args.k_values
            )
            logger.info(f"{name:32s} {row}")

    save_json(results, args.results_file)
    logger.info(f"Saved results to {args.results_file}")


if __name__ == "__main__":
    main()
