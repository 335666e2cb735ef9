"""Data-loading API shim (reference etpgt/train/dataloader.py surface).

The real implementation lives in gat_recommendation_tpu.data.batching (the
fixed-shape bucketed batcher). This module keeps the reference's import
surface so users migrating from the reference find the same names:

    SessionDataset   — same constructor signature
    collate_fn       — assembles a fixed-shape SessionBatch from samples
    create_dataloader — returns an epoch-iterable factory
"""

from __future__ import annotations

from pathlib import Path

from gat_recommendation_tpu.data.batching import (  # noqa: F401
    DEFAULT_BUCKETS,
    SessionBatch,
    SessionDataset,
    collate,
    iterate_batches,
)

collate_fn = collate


class DataLoader:
    """Epoch-iterable over bucketed SessionBatches (len = #sessions/batch est.)."""

    def __init__(self, dataset: SessionDataset, batch_size: int, shuffle: bool,
                 seed: int = 0, engine: str = "auto"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.engine = engine
        self._epoch = 0

    def __iter__(self):
        seed = self.seed + (self._epoch if self.shuffle else 0)
        self._epoch += 1
        return iterate_batches(
            self.dataset, self.batch_size, shuffle=self.shuffle, seed=seed,
            engine=self.engine,
        )

    def __len__(self) -> int:
        return -(-len(self.dataset) // self.batch_size)


def create_dataloader(
    sessions_path: str | Path,
    graph_edges_path: str | Path,
    batch_size: int = 32,
    num_negatives: int = 5,
    max_session_length: int = 50,
    shuffle: bool = True,
    num_workers: int = 0,  # accepted for signature parity; batching is native C++
    seed: int = 0,
) -> DataLoader:
    """Reference create_dataloader parity (dataloader.py:205-241)."""
    from gat_recommendation_tpu.data.graph import load_edges

    dataset = SessionDataset(
        sessions_path,
        load_edges(graph_edges_path),
        num_negatives=num_negatives,
        max_session_length=max_session_length,
    )
    return DataLoader(dataset, batch_size, shuffle, seed=seed)
