"""GraphSAGE baseline (functional re-design of reference etpgt/model/graphsage.py:10-117).

Stack: num_layers x (SAGEConv -> BatchNorm -> ReLU -> Dropout) -> readout.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from gat_recommendation_tpu.models import base
from gat_recommendation_tpu.models.layers import init_sage_conv, sage_conv
from gat_recommendation_tpu.ops.masked import dropout as dropout_fn
from gat_recommendation_tpu.ops.masked import init_batch_norm, masked_batch_norm


@dataclass(frozen=True)
class GraphSAGEConfig:
    num_items: int
    embedding_dim: int = 256
    hidden_dim: int = 256
    num_layers: int = 3
    dropout: float = 0.1
    readout_type: str = "mean"
    aggregator: str = "mean"


def init(rng: jax.Array, cfg: GraphSAGEConfig) -> tuple[dict, dict]:
    keys = jax.random.split(rng, 2 + cfg.num_layers)
    params: dict = {
        "item_embedding": base.init_item_embedding(keys[0], cfg.num_items, cfg.embedding_dim),
        "readout": base.init_readout(keys[1], cfg.hidden_dim, cfg.readout_type),
        "convs": [],
        "batch_norms": [],
    }
    state: dict = {"batch_norms": []}
    in_dim = cfg.embedding_dim
    for i in range(cfg.num_layers):
        params["convs"].append(
            init_sage_conv(keys[2 + i], in_dim, cfg.hidden_dim, cfg.aggregator)
        )
        bn_p, bn_s = init_batch_norm(cfg.hidden_dim)
        params["batch_norms"].append(bn_p)
        state["batch_norms"].append(bn_s)
        in_dim = cfg.hidden_dim
    return params, state


def apply(
    params: dict,
    state: dict,
    batch,
    cfg: GraphSAGEConfig,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    node_embeddings: jax.Array | None = None,
) -> tuple[jax.Array, dict]:
    if rng is None:
        rng = jax.random.key(0)
    x = (
        node_embeddings
        if node_embeddings is not None
        else params["item_embedding"][batch.node_ids]
    )
    new_state: dict = {"batch_norms": []}

    adj = batch.dense_adj()  # unpack bit-packed transfer form once
    for i in range(cfg.num_layers):
        rng, k_drop = jax.random.split(rng)
        x = sage_conv(params["convs"][i], x, adj, aggregator=cfg.aggregator)
        x, bn_s = masked_batch_norm(
            params["batch_norms"][i], state["batch_norms"][i], x, batch.node_mask, train
        )
        new_state["batch_norms"].append(bn_s)
        x = jnp.maximum(x, 0.0)
        x = dropout_fn(k_drop, x, cfg.dropout, train)

    sess = base.apply_readout(
        params["readout"], x, batch.node_mask, batch.num_nodes, cfg.readout_type
    )
    return sess, new_state


def create_graphsage(num_items: int, **kwargs) -> "Model":
    from gat_recommendation_tpu.models.registry import Model

    cfg = GraphSAGEConfig(num_items=num_items, **kwargs)
    return Model(name="graphsage", config=cfg, init=init, apply=apply)
