"""Data layer: CPU-side pipeline (synthetic/sessionize/split/graph) + the
bucketed fixed-shape batching engines (numpy and native C++).

Re-designs reference layer 1 (scripts/data/00-04 + etpgt/train/dataloader.py)
for TPU consumption: flat arrays, CSR adjacency, padded node-count buckets.
"""

from gat_recommendation_tpu.data.graph import build_co_event_graph
from gat_recommendation_tpu.data.sessionize import compute_session_stats, sessionize_events
from gat_recommendation_tpu.data.splits import create_temporal_splits
from gat_recommendation_tpu.data.synthetic import (
    generate_structured_events,
    generate_synthetic_events,
)

__all__ = [
    "build_co_event_graph",
    "compute_session_stats",
    "create_temporal_splits",
    "generate_structured_events",
    "generate_synthetic_events",
    "sessionize_events",
]
