#!/usr/bin/env python3
"""Training CLI (reference scripts/train/train_baseline.py:27-290 parity).

num_items comes from split_info.json (reference :145-150); transformer models
get a full-graph Laplacian-PE precompute (reference :210-243); optional GCS
artifact movement is gated on google-cloud-storage availability; --resume is
a new capability (the reference cannot resume).
"""

import argparse
import json
from pathlib import Path

import optax

from gat_recommendation_tpu.data.batching import SessionDataset, iterate_batches
from gat_recommendation_tpu.data.graph import load_edges
from gat_recommendation_tpu.models import create_model
from gat_recommendation_tpu.models.registry import count_params
from gat_recommendation_tpu.train import Trainer, create_loss_function
from gat_recommendation_tpu.utils.logging import get_logger
from gat_recommendation_tpu.utils.seed import set_seed


def parse_args():
    p = argparse.ArgumentParser(description="Train session-recommendation models")
    p.add_argument("--model", type=str, default="graph_transformer_optimized",
                   choices=["graphsage", "gat", "graph_transformer", "graph_transformer_optimized"])
    p.add_argument("--train-sessions", type=str, default="data/processed/train.csv")
    p.add_argument("--val-sessions", type=str, default="data/processed/val.csv")
    p.add_argument("--graph-edges", type=str, default="data/processed/graph_edges.csv")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--num-negatives", type=int, default=5)
    p.add_argument("--max-session-length", type=int, default=50)
    p.add_argument("--embedding-dim", type=int, default=256)
    p.add_argument("--hidden-dim", type=int, default=256)
    p.add_argument("--num-layers", type=int, default=None,
                   help="default: model-specific (2 for optimized GT, 3 otherwise)")
    p.add_argument("--num-heads", type=int, default=None)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--readout-type", type=str, default="mean",
                   choices=["mean", "max", "last", "attention"])
    p.add_argument("--loss-type", type=str, default="dual",
                   choices=["bpr", "listwise", "dual", "sampled_softmax"])
    p.add_argument("--alpha", type=float, default=0.7)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=1e-5)
    p.add_argument("--max-epochs", type=int, default=100)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--eval-every", type=int, default=1)
    p.add_argument("--checkpoint-every", type=int, default=1,
                   help="save checkpoint_latest on every Nth evaluation (counted "
                        "in eval occurrences, so it composes with --eval-every; "
                        "best is always saved on improvement and the final "
                        "trained epoch is always backstop-saved). At reference "
                        "scale the latest save is 1.2 GB — worth raising on "
                        "remote-relay TPU setups")
    p.add_argument("--output-dir", type=str, default="outputs")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resume", action="store_true", help="resume from checkpoint_latest")
    p.add_argument("--gcs-bucket", type=str, default=None)
    p.add_argument("--sparse-grads", action=argparse.BooleanOptionalAction, default=True,
                   help="sparse embedding gradients + fused AdamW (2.5x faster on "
                        "TPU, same math — docs/PERFORMANCE.md); --no-sparse-grads "
                        "uses the dense optax step")
    p.add_argument("--transfer-workers", type=int, default=2,
                   help="parallel host->device transfer threads (each "
                        "device_put blocks its thread on a relay RPC round "
                        "trip — docs/PERFORMANCE.md)")
    p.add_argument("--workers", type=int, default=3,
                   help="host batch-assembly threads (C++ engine releases the GIL)")
    p.add_argument("--chain", type=int, default=32,
                   help="optimizer steps folded into one dispatch via lax.scan "
                        "(single-device sparse path; same math and RNG stream "
                        "as unchained — docs/PERFORMANCE.md 'Step chaining'). "
                        "1 disables")
    p.add_argument("--record-hits", action="store_true",
                   help="record per-session val hit vectors (recall@k0) into "
                        "a packed-bit hits_k{k}.npz sidecar — enables paired "
                        "bootstrap CIs on model ordering margins "
                        "(summarize_refscale.py)")
    p.add_argument("--bf16-moments", nargs="?", const="both", default=None,
                   choices=["both", "mu", "nu"],
                   help="store the embedding-table AdamW moments in bfloat16 "
                        "with stochastic rounding (halves moment HBM traffic; "
                        "quality measured in docs/PERFORMANCE.md). Optional "
                        "value narrows only one buffer (attribution study)")
    p.add_argument("--lazy-adamw", action="store_true",
                   help="lazy catch-up AdamW for the embedding table: "
                        "O(touched rows)/step instead of the dense [V, D] "
                        "optimizer sweep (ops/lazy_adamw.py; ~exact dense-"
                        "AdamW semantics; works sharded under --mesh too)")
    p.add_argument("--no-sr-moments", action="store_true",
                   help="ablation: bf16 moments with round-to-nearest instead "
                        "of stochastic rounding (reproduces the r4 quality "
                        "collapse — docs/EXPERIMENTS.md)")
    p.add_argument("--distributed", choices=["auto", "off"], default="auto",
                   help="auto: jax.distributed.initialize() when a multi-process "
                        "launch is detected (COORDINATOR_ADDRESS/NUM_PROCESSES/"
                        "PROCESS_ID env or TPU pod metadata); off: single process")
    p.add_argument("--mesh", action=argparse.BooleanOptionalAction, default=None,
                   help="train over a ('data','model') device mesh; default: on "
                        "when >1 device is visible (incl. multi-host), off otherwise")
    p.add_argument("--n-model", type=int, default=1,
                   help="size of the 'model' mesh axis (embedding-table row shards)")
    return p.parse_args()


def maybe_gcs_download(bucket: str | None, paths: list[str], logger) -> None:
    if not bucket:
        return
    try:
        from google.cloud import storage  # type: ignore
    except ImportError:
        logger.warning("google-cloud-storage not installed; skipping GCS download")
        return
    client = storage.Client()
    b = client.bucket(bucket)
    for path in paths:
        local = Path(path)
        local.parent.mkdir(parents=True, exist_ok=True)
        b.blob(path).download_to_filename(str(local))
        logger.info(f"gs://{bucket}/{path} -> {local}")


def maybe_gcs_upload(bucket: str | None, output_dir: Path, logger, client=None) -> int:
    """Push training outputs back to the bucket (reference parity:
    scripts/train/train_baseline.py:107-119,286 — without this a Vertex TPU
    job's trained model dies with the container). Walks output_dir
    (checkpoint_best/, checkpoint_latest/, history.json) and uploads every
    file under the same relative prefix. Returns the file count.
    `client` is injectable for tests."""
    if not bucket:
        return 0
    if client is None:
        try:
            from google.cloud import storage  # type: ignore
        except ImportError:
            logger.warning("google-cloud-storage not installed; skipping GCS upload")
            return 0
        client = storage.Client()
    b = client.bucket(bucket)
    n = 0
    for f in sorted(output_dir.rglob("*")):
        if not f.is_file():
            continue
        remote = f.relative_to(output_dir.parent).as_posix()
        b.blob(remote).upload_from_filename(str(f))
        logger.info(f"{f} -> gs://{bucket}/{remote}")
        n += 1
    return n


def main() -> None:
    args = parse_args()
    logger = get_logger(__name__)

    # Multi-host: initialize jax.distributed BEFORE any other JAX API so
    # jax.devices() is the global device list (parallel/distributed.py).
    from gat_recommendation_tpu.parallel import distributed as dist

    dist_active = dist.initialize() if args.distributed == "auto" else False
    import jax

    # Persistent XLA cache: cold starts pay ~15 min of bucket-variant
    # compiles through remote relays; warm starts reload from disk
    # (docs/PERFORMANCE.md "Compile warmup").
    from gat_recommendation_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    pindex, pcount = jax.process_index(), jax.process_count()
    if dist_active:
        logger.info(
            f"Distributed: process {pindex}/{pcount}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        )
    set_seed(args.seed)

    maybe_gcs_download(
        args.gcs_bucket,
        [args.train_sessions, args.val_sessions, args.graph_edges,
         str(Path(args.train_sessions).parent / "split_info.json")],
        logger,
    )

    split_info_path = Path(args.train_sessions).parent / "split_info.json"
    with open(split_info_path) as f:
        num_items = json.load(f)["num_items"]
    logger.info(f"Number of items: {num_items:,}")

    edges = load_edges(args.graph_edges)
    train_ds = SessionDataset(
        args.train_sessions, edges,
        num_negatives=args.num_negatives,
        max_session_length=args.max_session_length,
        num_items=num_items,
    )
    val_ds = SessionDataset(
        args.val_sessions, edges,
        num_negatives=args.num_negatives,
        max_session_length=args.max_session_length,
        num_items=num_items,
    )
    logger.info(f"Train sessions: {len(train_ds):,} | Val sessions: {len(val_ds):,}")

    model_kwargs: dict = dict(
        embedding_dim=args.embedding_dim,
        hidden_dim=args.hidden_dim,
        dropout=args.dropout,
        readout_type=args.readout_type,
    )
    if args.num_layers is not None:
        model_kwargs["num_layers"] = args.num_layers
    if args.num_heads is not None and args.model != "graphsage":
        model_kwargs["num_heads"] = args.num_heads
    model = create_model(args.model, num_items, **model_kwargs)

    use_mesh = args.mesh if args.mesh is not None else (jax.device_count() > 1 or pcount > 1)
    if args.sparse_grads:
        from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW

        # auto: single-pass Pallas AdamW on TPU (shard_mapped over 'model'
        # row shards under a mesh — parallel/steps.py), XLA path elsewhere.
        import jax.numpy as jnp

        moment_dtype = {
            None: None,
            "both": jnp.bfloat16,
            "mu": (jnp.bfloat16, None),
            "nu": (None, jnp.bfloat16),
        }[args.bf16_moments]
        optimizer = FusedEmbeddingAdamW(
            args.lr, weight_decay=args.weight_decay,
            moment_dtype=moment_dtype,
            stochastic_rounding=False if args.no_sr_moments else None,
            lazy=args.lazy_adamw,
        )
    else:
        optimizer = optax.adamw(args.lr, weight_decay=args.weight_decay)

    mesh = None
    if use_mesh:
        from gat_recommendation_tpu.parallel import make_mesh

        mesh = make_mesh(n_model=args.n_model)
        logger.info(f"Mesh: {dict(mesh.shape)} over {jax.device_count()} devices")

    # Multi-host feeding: args.batch_size is the GLOBAL batch size; each
    # process assembles its own rows of every global batch and the sparse
    # path's GradIndex is reconstructed over the global id set (meta.ids).
    feed = dict(process_index=pindex, process_count=pcount,
                with_global_ids=args.sparse_grads and pcount > 1,
                workers=args.workers)
    trainer = Trainer(
        model,
        train_batches=lambda epoch: iterate_batches(
            train_ds, batch_size=args.batch_size, shuffle=True, seed=args.seed + epoch, **feed
        ),
        val_batches=lambda: iterate_batches(
            val_ds, batch_size=args.batch_size, shuffle=False, seed=0, **feed
        ),
        optimizer=optimizer,
        output_dir=Path(args.output_dir) / args.model,
        max_epochs=args.max_epochs,
        patience=args.patience,
        eval_every=args.eval_every,
        checkpoint_every=args.checkpoint_every,
        loss_fn=create_loss_function(args.loss_type, args.alpha, args.temperature),
        seed=args.seed,
        mesh=mesh,
        sparse_embedding_grads=args.sparse_grads,
        chain=args.chain,  # sharded chaining: parallel/steps.py (multi-host
        # runs fall back to unchained steps, logged by the Trainer)
        record_hits=args.record_hits,
        transfer_workers=args.transfer_workers,
    )

    params, state, opt_state = trainer.init_state()
    logger.info(f"Model parameters: {count_params(params) - num_items * args.embedding_dim:,} "
                f"(+ embedding table {num_items * args.embedding_dim:,})")
    if model.uses_laplacian_pe:
        logger.info("Precomputing Laplacian PE for the full graph...")
        state = model.precompute_pe(state, *edges)
        logger.info("Laplacian PE precomputed")

    trainer.train(params, state, opt_state, resume=args.resume)
    logger.info(f"Done. Best recall@10: {trainer.best_val_metric:.4f}")

    if pindex == 0:  # upload once; checkpoint dir is shared storage multi-host
        maybe_gcs_upload(args.gcs_bucket, Path(args.output_dir) / args.model, logger)


if __name__ == "__main__":
    main()
