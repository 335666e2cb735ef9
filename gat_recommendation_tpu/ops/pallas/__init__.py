"""Pallas TPU kernels for the measured hot paths.

Profiling on TPU v5e (B=512, 466,865-item catalog) showed the train step is
dominated not by the GNN math (sub-ms) but by HBM traffic over the embedding
table: XLA executes the optax AdamW chain as ~13 separate elementwise passes
over 478 MB. Kernels that survived measurement (docs/PERFORMANCE.md):

  * fused_embedding_adamw: single-pass AdamW over the dense table gradient —
    in-place via input_output_aliases.
  * fused_sparse_adamw: the production path — single-pass AdamW over only the
    touched rows (gathered grad + row index), also mesh-capable via
    sharded_fused_sparse_adamw (shard_map over the 'model' axis).

Measured negative results kept for the record (NOT wired into any model, see
docs/PERFORMANCE.md for the numbers): score_chunkmax.fused_two_level_topk
(XLA's two-level top-k already hits the same HBM bound) and
session_attention.fused_session_attention (0.31-0.79x vs the XLA segment-op
path at production shapes; its config flag was removed).
"""

from gat_recommendation_tpu.ops.pallas.embedding_adamw import (
    adamw_update_reference,
    fused_embedding_adamw,
)
from gat_recommendation_tpu.ops.pallas.sparse_adamw import (
    fused_sparse_adamw,
    sharded_fused_sparse_adamw,
)

__all__ = [
    "fused_embedding_adamw",
    "adamw_update_reference",
    "fused_sparse_adamw",
    "sharded_fused_sparse_adamw",
]
