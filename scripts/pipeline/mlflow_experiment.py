#!/usr/bin/env python3
"""Experiment tracking (reference scripts/pipeline/mlflow_experiment.py parity).

Logs params/metrics/artifacts around a short training run for each registered
model. Uses MLflow when installed; otherwise falls back to an equivalent
local JSON tracking store under --tracking-dir (same information captured, no
external dependency — MLflow is absent from TPU images).
"""

import argparse
import json
import time
import uuid
from pathlib import Path

import numpy as np

from gat_recommendation_tpu.utils.logging import get_logger

logger = get_logger(__name__)

MODEL_REGISTRY = {
    "graphsage": "GraphSAGE baseline (mean aggregator)",
    "gat": "Graph Attention Network baseline",
    "graph_transformer": "Graph Transformer with Laplacian PE (FFN)",
    "graph_transformer_optimized": "Optimized Graph Transformer (no FFN, 2 layers, 2 heads)",
}


class LocalTracker:
    """JSON-file MLflow stand-in: one run directory per (experiment, run)."""

    def __init__(self, tracking_dir: str, experiment: str):
        self.root = Path(tracking_dir) / experiment
        self.root.mkdir(parents=True, exist_ok=True)
        self.run_dir: Path | None = None
        self.data: dict = {}

    def start_run(self, run_name: str):
        self.run_dir = self.root / f"{run_name}-{uuid.uuid4().hex[:8]}"
        self.run_dir.mkdir(parents=True)
        self.data = {"run_name": run_name, "params": {}, "metrics": {}, "tags": {},
                     "start_time": time.time()}
        return self

    def log_params(self, params: dict):
        self.data["params"].update({k: str(v) for k, v in params.items()})

    def log_metrics(self, metrics: dict, step: int | None = None):
        for k, v in metrics.items():
            self.data["metrics"].setdefault(k, []).append(
                {"value": float(v), "step": step, "time": time.time()}
            )

    def set_tags(self, tags: dict):
        self.data["tags"].update(tags)

    def end_run(self):
        self.data["end_time"] = time.time()
        with open(self.run_dir / "run.json", "w") as f:
            json.dump(self.data, f, indent=2)
        logger.info(f"Run logged to {self.run_dir}")


def get_tracker(tracking_dir: str, experiment: str):
    try:
        import mlflow

        mlflow.set_tracking_uri(tracking_dir)
        mlflow.set_experiment(experiment)
        return "mlflow", mlflow
    except ImportError:
        logger.info("mlflow not installed; using local JSON tracking store")
        return "local", LocalTracker(tracking_dir, experiment)


def run_experiment(model_name: str, tracker_kind: str, tracker, args) -> dict:
    import jax
    import optax

    from gat_recommendation_tpu.data.batching import collate, to_device
    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.models.registry import count_params
    from gat_recommendation_tpu.train.losses import dual_loss
    from gat_recommendation_tpu.train.trainer import make_train_step

    rng = np.random.default_rng(0)
    num_items = 500
    batches = []
    for _ in range(4):
        samples = []
        for _ in range(16):
            n = int(rng.integers(3, 8))
            nodes = np.sort(rng.choice(np.arange(1, num_items), n, replace=False)).astype(np.int32)
            m = int(rng.integers(n, 3 * n))
            samples.append({"nodes": nodes,
                            "edge_src": rng.integers(0, n, m).astype(np.int32),
                            "edge_dst": rng.integers(0, n, m).astype(np.int32),
                            "target": int(rng.integers(1, num_items)),
                            "negatives": rng.integers(1, num_items, 5).astype(np.int32)})
        batches.append(collate(samples, 8, 5))

    kwargs: dict = dict(embedding_dim=32, hidden_dim=32)
    if model_name.startswith("graph_transformer"):
        kwargs["laplacian_k"] = 4
    model = create_model(model_name, num_items, **kwargs)
    params, state = model.init_params(jax.random.key(0))
    if model.uses_laplacian_pe:
        state = model.precompute_pe(state, np.arange(1, 60), np.arange(2, 61))
    optimizer = optax.adamw(args.lr)
    opt_state = optimizer.init(params)
    step = make_train_step(model, dual_loss, optimizer)

    run_params = {"model": model_name, "lr": args.lr, "epochs": args.epochs,
                  "num_params": count_params(params),
                  "description": MODEL_REGISTRY[model_name]}

    if tracker_kind == "mlflow":
        ctx = tracker.start_run(run_name=model_name)
        tracker.log_params(run_params)
    else:
        tracker.start_run(model_name)
        tracker.log_params(run_params)

    losses = []
    for epoch in range(args.epochs):
        for i, hb in enumerate(batches):
            params, state, opt_state, loss = step(
                params, state, opt_state, to_device(hb), jax.random.key(epoch * 100 + i)
            )
            losses.append(float(loss))
        metrics = {"train_loss": float(np.mean(losses[-len(batches):]))}
        if tracker_kind == "mlflow":
            tracker.log_metrics(metrics, step=epoch)
        else:
            tracker.log_metrics(metrics, step=epoch)

    if tracker_kind == "mlflow":
        ctx.__exit__(None, None, None)
    else:
        tracker.end_run()
    return {"final_loss": losses[-1], "finite": bool(np.isfinite(losses).all())}


def main() -> None:
    parser = argparse.ArgumentParser(description="Tracked experiment runs")
    parser.add_argument("--models", nargs="+", default=list(MODEL_REGISTRY),
                        choices=list(MODEL_REGISTRY))
    parser.add_argument("--tracking-dir", type=str, default="mlruns")
    parser.add_argument("--experiment", type=str, default="session-recommendation")
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--lr", type=float, default=1e-3)
    args = parser.parse_args()

    kind, tracker = get_tracker(args.tracking_dir, args.experiment)
    for name in args.models:
        logger.info(f"Running {name}...")
        result = run_experiment(name, kind, tracker, args)
        logger.info(f"{name}: final_loss={result['final_loss']:.4f} finite={result['finite']}")


if __name__ == "__main__":
    main()
