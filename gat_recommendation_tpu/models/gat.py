"""GAT baseline (functional re-design of reference etpgt/model/gat.py:10-183).

Layer stack: first GATConv + (num_layers-2) middle + final averaged-head
layer; BatchNorm after every conv; ReLU+dropout on all but the last layer;
concat_heads widens intermediate dims by num_heads.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from gat_recommendation_tpu.models import base
from gat_recommendation_tpu.models.layers import gat_conv, init_gat_conv
from gat_recommendation_tpu.ops.masked import dropout as dropout_fn
from gat_recommendation_tpu.ops.masked import init_batch_norm, masked_batch_norm


@dataclass(frozen=True)
class GATConfig:
    num_items: int
    embedding_dim: int = 256
    hidden_dim: int = 256
    num_layers: int = 3
    num_heads: int = 4
    dropout: float = 0.1
    readout_type: str = "mean"
    concat_heads: bool = False


def _layer_plan(cfg: GATConfig) -> list[tuple[int, bool]]:
    """[(in_dim, concat)] per conv, mirroring reference gat.py:42-111."""
    plan = []
    current = cfg.embedding_dim
    plan.append((current, cfg.concat_heads))
    current = cfg.hidden_dim * cfg.num_heads if cfg.concat_heads else cfg.hidden_dim
    for _ in range(cfg.num_layers - 2):
        plan.append((current, cfg.concat_heads))
        current = cfg.hidden_dim * cfg.num_heads if cfg.concat_heads else cfg.hidden_dim
    if cfg.num_layers > 1:
        plan.append((current, False))  # final layer always averages heads
    return plan


def init(rng: jax.Array, cfg: GATConfig) -> tuple[dict, dict]:
    plan = _layer_plan(cfg)
    keys = jax.random.split(rng, 2 + len(plan))
    params: dict = {
        "item_embedding": base.init_item_embedding(keys[0], cfg.num_items, cfg.embedding_dim),
        "readout": base.init_readout(keys[1], cfg.hidden_dim, cfg.readout_type),
        "convs": [],
        "batch_norms": [],
    }
    state: dict = {"batch_norms": []}
    for i, (in_dim, concat) in enumerate(plan):
        params["convs"].append(init_gat_conv(keys[2 + i], in_dim, cfg.hidden_dim, cfg.num_heads, concat))
        out_dim = cfg.hidden_dim * cfg.num_heads if concat else cfg.hidden_dim
        bn_p, bn_s = init_batch_norm(out_dim)
        params["batch_norms"].append(bn_p)
        state["batch_norms"].append(bn_s)
    return params, state


def apply(
    params: dict,
    state: dict,
    batch,
    cfg: GATConfig,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    node_embeddings: jax.Array | None = None,
) -> tuple[jax.Array, dict]:
    if rng is None:
        rng = jax.random.key(0)
    plan = _layer_plan(cfg)
    x = (
        node_embeddings
        if node_embeddings is not None
        else params["item_embedding"][batch.node_ids]
    )
    new_state: dict = {"batch_norms": []}

    adj = batch.dense_adj()  # unpack bit-packed transfer form once
    for i, (_, concat) in enumerate(plan):
        rng, k_attn, k_drop = jax.random.split(rng, 3)
        x = gat_conv(
            params["convs"][i],
            x,
            adj,
            batch.node_mask,
            heads=cfg.num_heads,
            concat=concat,
            dropout_rate=cfg.dropout,
            train=train,
            rng=k_attn,
        )
        x, bn_s = masked_batch_norm(
            params["batch_norms"][i], state["batch_norms"][i], x, batch.node_mask, train
        )
        new_state["batch_norms"].append(bn_s)
        if i < len(plan) - 1:  # no activation on last layer (gat.py:137-141)
            x = jnp.maximum(x, 0.0)
            x = dropout_fn(k_drop, x, cfg.dropout, train)

    sess = base.apply_readout(
        params["readout"], x, batch.node_mask, batch.num_nodes, cfg.readout_type
    )
    return sess, new_state


def create_gat(num_items: int, **kwargs) -> "Model":
    from gat_recommendation_tpu.models.registry import Model

    cfg = GATConfig(num_items=num_items, **kwargs)
    return Model(name="gat", config=cfg, init=init, apply=apply)
