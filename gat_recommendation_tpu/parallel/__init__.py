"""Parallelism layer: device mesh, sharding rules, sharded train/eval steps.

The reference is single-GPU with no distributed training at all (SURVEY.md
§2.4). This layer is the TPU-native scaling design it lacks:

  * one ``jax.sharding.Mesh`` with axes ('data', 'model') — DP over sessions,
    the 466k-row item-embedding table and full-catalog scorer sharded over
    'model' (rows / vocab axis);
  * XLA GSPMD inserts the collectives (psum grad all-reduce over 'data',
    gather/all-to-all for embedding rows, all-gather for top-k merge) from
    NamedSharding annotations — no hand-written NCCL analogue.
"""

from gat_recommendation_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    state_shardings,
)
from gat_recommendation_tpu.parallel.steps import (
    make_sharded_eval_step,
    make_sharded_sparse_train_step,
    make_sharded_train_step,
)

__all__ = [
    "make_mesh",
    "param_shardings",
    "state_shardings",
    "batch_sharding",
    "replicated",
    "make_sharded_sparse_train_step",
    "make_sharded_train_step",
    "make_sharded_eval_step",
]
