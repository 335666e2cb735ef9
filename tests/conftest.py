"""Test fixtures: CPU backend with 8 virtual devices for sharding tests.

Mirrors the reference's fixture strategy (tests/conftest.py:8-123: tiny
hand-built graphs as the universal fake backend) plus the multi-device
simulation the reference lacks (SURVEY.md §4).
"""

import os

# Force the CPU backend: the session environment registers a TPU plugin via
# sitecustomize and pins jax_platforms to it, which would make unit tests
# compile for (and run on) real hardware with bf16 matmul defaults. The env
# var alone is overridden by the plugin's own config update, so set the jax
# config directly. Tests use 8 virtual CPU devices for sharding coverage.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def small_model_config():
    """100 items, 32-dim, 2 layers (reference conftest parity)."""
    return {
        "num_items": 100,
        "embedding_dim": 32,
        "hidden_dim": 32,
        "num_layers": 2,
        "dropout": 0.1,
    }


def make_dummy_batch(num_negatives: int = 5, bucket_n: int = 8):
    """Two hand-built session graphs (3 and 4 nodes, bidirectional edges)."""
    from gat_recommendation_tpu.data.batching import collate

    rng = np.random.default_rng(0)
    samples = []
    # Session 1: nodes {1, 2, 3}, chain edges 1<->2<->3.
    samples.append(
        {
            "nodes": np.array([1, 2, 3], dtype=np.int32),
            "edge_src": np.array([0, 1, 1, 2], dtype=np.int32),
            "edge_dst": np.array([1, 0, 2, 1], dtype=np.int32),
            "target": 4,
            "negatives": rng.integers(1, 100, num_negatives).astype(np.int32),
        }
    )
    # Session 2: nodes {5, 6, 7, 8}, ring edges.
    samples.append(
        {
            "nodes": np.array([5, 6, 7, 8], dtype=np.int32),
            "edge_src": np.array([0, 1, 1, 2, 2, 3, 3, 0], dtype=np.int32),
            "edge_dst": np.array([1, 0, 2, 1, 3, 2, 0, 3], dtype=np.int32),
            "target": 9,
            "negatives": rng.integers(1, 100, num_negatives).astype(np.int32),
        }
    )
    return collate(samples, bucket_n, num_negatives)


@pytest.fixture
def dummy_batch():
    return make_dummy_batch()
