"""Training layer: losses, metrics, jitted train/eval steps, Trainer."""

from gat_recommendation_tpu.train.losses import (
    bpr_loss,
    create_loss_function,
    dual_loss,
    listwise_loss,
    sampled_softmax_loss,
)
from gat_recommendation_tpu.train.metrics import (
    compute_ndcg_at_k,
    compute_recall_at_k,
    compute_stratified_metrics,
)
from gat_recommendation_tpu.train.trainer import Trainer

__all__ = [
    "bpr_loss",
    "listwise_loss",
    "dual_loss",
    "sampled_softmax_loss",
    "create_loss_function",
    "compute_recall_at_k",
    "compute_ndcg_at_k",
    "compute_stratified_metrics",
    "Trainer",
]
