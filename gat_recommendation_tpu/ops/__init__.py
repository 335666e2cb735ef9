"""Compute ops: masked dense primitives + Pallas TPU kernels.

The reference leans on PyG/torch-scatter CUDA kernels for irregular
gather/scatter + segment softmax (SURVEY.md §2.5). Here message passing is
batched *dense* masked attention/aggregation over per-session adjacency masks
(sessions are <=56 nodes), so the hot ops are MXU matmuls with VPU masking —
implemented in jax.numpy with Pallas fused variants in ops/pallas/.
"""

from gat_recommendation_tpu.ops.masked import (
    masked_batch_norm,
    masked_max,
    masked_mean,
    masked_softmax,
)

__all__ = ["masked_softmax", "masked_mean", "masked_max", "masked_batch_norm"]
