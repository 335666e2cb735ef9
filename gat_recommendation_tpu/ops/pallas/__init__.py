"""Pallas TPU kernels for the measured hot paths.

Profiling on TPU v5e (B=512, 466,865-item catalog) showed the train step is
dominated not by the GNN math (sub-ms) but by HBM traffic over the embedding
table: XLA executes the optax AdamW chain as ~13 separate elementwise passes
over 478 MB. Kernels here collapse those passes:

  * embedding_adamw: fused single-pass AdamW update of (w, mu, nu) given the
    dense table gradient — in-place via input_output_aliases.
  * topk_score: streaming full-catalog scorer+top-k that never materializes
    the [B, V] score matrix in HBM.
"""

from gat_recommendation_tpu.ops.pallas.embedding_adamw import (
    adamw_update_reference,
    fused_embedding_adamw,
)

__all__ = ["fused_embedding_adamw", "adamw_update_reference"]
