"""Model zoo: GraphSAGE / GAT / Graph Transformer (+ Laplacian PE).

Functional JAX re-designs of the reference etpgt/model/ family
(re-exports mirror etpgt/model/__init__.py:12-26). Each model is a
(Config, init, apply) triple over the fixed-shape SessionBatch layout.
"""

from gat_recommendation_tpu.models.base import (
    bpr_loss_from_embeddings,
    init_item_embedding,
    predict_topk,
)
from gat_recommendation_tpu.models.gat import GATConfig, create_gat
from gat_recommendation_tpu.models.graph_transformer import (
    GraphTransformerConfig,
    create_graph_transformer,
    create_graph_transformer_optimized,
)
from gat_recommendation_tpu.models.graphsage import GraphSAGEConfig, create_graphsage
from gat_recommendation_tpu.models.laplacian_pe import compute_laplacian_pe
from gat_recommendation_tpu.models.registry import Model, create_model

__all__ = [
    "Model",
    "create_model",
    "create_graphsage",
    "create_gat",
    "create_graph_transformer",
    "create_graph_transformer_optimized",
    "GraphSAGEConfig",
    "GATConfig",
    "GraphTransformerConfig",
    "compute_laplacian_pe",
    "init_item_embedding",
    "predict_topk",
    "bpr_loss_from_embeddings",
]
