"""Deterministic seeding (parity with reference etpgt/utils/seed.py:10-24).

The reference seeds python/numpy/torch + cudnn determinism. Here the device RNG
is JAX's counter-based PRNG, which is deterministic by construction; we seed the
host-side generators and hand back a root ``jax.random.key``.
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int = 42):
    """Seed python/numpy and return a JAX PRNG key for device-side randomness."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    import jax

    return jax.random.key(seed)
