"""Model wrapper + factory dispatch (reference train_baseline.py:180-246 dispatch parity)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax


@dataclass
class Model:
    """A (config, init, apply) triple with convenience helpers.

    init(rng, cfg) -> (params, state)
    apply(params, state, batch, cfg, *, train, rng) -> (session_embeddings, new_state)
    """

    name: str
    config: Any
    init: Callable = field(repr=False)
    apply: Callable = field(repr=False)

    def init_params(self, rng: jax.Array):
        return self.init(rng, self.config)

    def __call__(self, params, state, batch, *, train: bool = False, rng=None):
        return self.apply(params, state, batch, self.config, train=train, rng=rng)

    @property
    def uses_laplacian_pe(self) -> bool:
        return bool(getattr(self.config, "use_laplacian_pe", False))

    def precompute_pe(self, state: dict, item_i, item_j) -> dict:
        """Fill state['cached_pe'] from the full co-occurrence graph."""
        from gat_recommendation_tpu.models import graph_transformer

        if not self.uses_laplacian_pe:
            return state
        return graph_transformer.precompute_pe(state, self.config, item_i, item_j)


MODEL_NAMES = ("graphsage", "gat", "graph_transformer", "graph_transformer_optimized")


def create_model(name: str, num_items: int, **kwargs) -> Model:
    """Dispatch by model name (same names as the reference CLI --model flag)."""
    from gat_recommendation_tpu.models.gat import create_gat
    from gat_recommendation_tpu.models.graph_transformer import (
        create_graph_transformer,
        create_graph_transformer_optimized,
    )
    from gat_recommendation_tpu.models.graphsage import create_graphsage

    if name == "graphsage":
        return create_graphsage(num_items, **kwargs)
    if name == "gat":
        return create_gat(num_items, **kwargs)
    if name == "graph_transformer":
        return create_graph_transformer(num_items, **kwargs)
    if name == "graph_transformer_optimized":
        return create_graph_transformer_optimized(num_items, **kwargs)
    raise ValueError(f"Unknown model: {name} (expected one of {MODEL_NAMES})")


def count_params(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
