"""Worker for the REAL multi-process multi-host test (test_multihost.py).

Launched twice (process_id 0 and 1) with a shared coordinator address; each
process sees 2 virtual CPU devices, so the global mesh is 4 devices
('data'=2, 'model'=2) spanning two processes — the same multi-controller
topology as a 2-host TPU slice, minus the ICI. Trains 2 epochs of the
sparse-grad sharded step with per-process batch assembly and writes the
resulting metrics for the parent to compare (across processes, and against
a single-process run of the identical global schedule).
"""

import json
import os
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    coordinator, pid, outdir = sys.argv[1], int(sys.argv[2]), Path(sys.argv[3])
    engine = sys.argv[4] if len(sys.argv) > 4 else "numpy"
    chain = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    from gat_recommendation_tpu.parallel import distributed as dist

    assert dist.initialize(coordinator_address=coordinator, num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 4, jax.devices()

    import numpy as np

    from gat_recommendation_tpu.data.batching import SessionDataset, iterate_batches
    from gat_recommendation_tpu.models import create_model
    from gat_recommendation_tpu.parallel import make_mesh
    from gat_recommendation_tpu.train import Trainer
    from gat_recommendation_tpu.train.optimizers import FusedEmbeddingAdamW
    from tests.multihost_case import make_case

    ds_train, ds_val, edges, num_items = make_case()
    mesh = make_mesh(n_model=2)

    feed = dict(process_index=pid, process_count=2, with_global_ids=True, engine=engine)
    trainer = Trainer(
        create_model("graph_transformer_optimized", num_items,
                     embedding_dim=32, hidden_dim=32, laplacian_k=4),
        train_batches=lambda epoch: iterate_batches(
            ds_train, batch_size=16, shuffle=True, seed=epoch, **feed
        ),
        val_batches=lambda: iterate_batches(ds_val, batch_size=16, seed=0, **feed),
        optimizer=FusedEmbeddingAdamW(1e-3, weight_decay=1e-5, use_pallas=False),
        output_dir=outdir / "ckpt",
        max_epochs=2,
        eval_every=1,
        seed=7,
        mesh=mesh,
        sparse_embedding_grads=True,
        chain=chain,
    )
    params, state, opt_state = trainer.init_state()
    hist = trainer.train(params, state, opt_state)

    result = {
        "process": pid,
        "train_loss": [float(x) for x in hist["train_loss"]],
        "val_metrics": hist["val_metrics"],
        "best": trainer.best_val_metric,
        "chained_dispatches": trainer.chained_dispatches,
    }
    (outdir / f"result_{pid}.json").write_text(json.dumps(result))
    print(f"[worker {pid}] OK {result['train_loss']}")


if __name__ == "__main__":
    main()
