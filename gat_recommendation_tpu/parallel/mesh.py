"""Mesh construction and sharding rules.

Sharding policy:
  * batch leaves: sharded over 'data' on axis 0;
  * params['item_embedding'] [V, D]: row-sharded over 'model' (the table is
    the only large tensor — 466,865 x 256 fp32 ≈ 456 MB, SURVEY.md §2.4);
  * state['cached_pe'] [V, k]: row-sharded over 'model' likewise;
  * every other param/state/opt leaf: replicated (models are 28K-112K params).

Optimizer state mirrors the param shardings automatically because optax
states are pytrees with leaves shaped like their params.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_TABLE_KEYS = ("item_embedding", "cached_pe", "emb_mu", "emb_nu")


def _is_table(path: tuple) -> bool:
    """Table-shaped leaves: the embedding, its cached PE, and the fused
    optimizer's moment buffers (FusedEmbeddingAdamW state) — all [V, ...]
    arrays that row-shard over 'model'."""
    return any(getattr(k, "key", None) in _TABLE_KEYS for k in path)


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree for params: embedding row-sharded, rest replicated."""
    rep = replicated(mesh)
    table = NamedSharding(mesh, P("model", None))
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: table if _is_table(path) and leaf.ndim == 2 else rep, params
    )


def state_shardings(state, mesh: Mesh):
    """NamedSharding tree for model state (cached_pe row-sharded, BN replicated)."""
    return param_shardings(state, mesh)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard over 'data' on the leading (batch) axis of every leaf."""
    return NamedSharding(mesh, P("data"))


def chained_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Stacked [C, B, ...] chain-group batches: chain axis unsharded (every
    scan iteration runs on the whole mesh), batch axis over 'data'."""
    return NamedSharding(mesh, P(None, "data"))


def opt_state_shardings(opt_state, params_shardings_tree, mesh: Mesh):
    """Optimizer-state shardings: param-shaped leaves inherit the param rule."""
    rep = replicated(mesh)
    table = NamedSharding(mesh, P("model", None))

    def rule(path, leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 2 and _is_table(path):
            return table
        return rep

    return jax.tree_util.tree_map_with_path(rule, opt_state)
