"""gat_recommendation_tpu — TPU-native session-based recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
ETP-GT project (session-based next-item recommendation over item co-occurrence
graphs): data pipeline, GNN model zoo (GraphSAGE / GAT / Graph Transformer with
Laplacian PE), training, evaluation, sharded multi-chip execution, and serving.

Design stance (vs the reference's PyTorch/PyG implementation):
  * Session subgraphs are small (<= 50 nodes), so message passing is executed as
    batched dense masked attention/aggregation over a per-session adjacency mask
    ``[B, N, N]`` — MXU-friendly, statically shaped, no irregular scatter.
  * Batches are padded to node-count buckets so every XLA program compiles once.
  * Parallelism is a ``jax.sharding.Mesh`` ('data', 'model'): batch sharded over
    'data', the item-embedding table and full-catalog scorer sharded over 'model'.
"""

__version__ = "0.1.0"
