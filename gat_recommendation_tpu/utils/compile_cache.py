"""Persistent XLA compilation cache.

The bucketed static-shape design trades recompiles for padding: one jit
variant per (node-bucket, unique-count-bucket, train/eval). On a cold start
through a remote-TPU relay that is ~15 minutes of compiles before the first
productive step (BENCH_r02 t_warm=926.8 s). JAX can serialize compiled
executables to disk and reload them on the next start; this module switches
that on with one call. Second runs of the same shapes then skip XLA entirely.

Call ``enable_persistent_cache()`` BEFORE the first jit execution (config
flags are read at compile time). Safe to call more than once.
"""

from __future__ import annotations

import os
from pathlib import Path

DEFAULT_DIR = "~/.cache/gat_recommendation_tpu/xla"
_enabled_dir: str | None = None


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir`` and return it.

    Resolution order: explicit argument > $GAT_REC_COMPILE_CACHE > the
    default under ~/.cache. Set GAT_REC_COMPILE_CACHE=off to disable (e.g.
    for compile-time benchmarking).
    """
    global _enabled_dir

    env = os.environ.get("GAT_REC_COMPILE_CACHE")
    if cache_dir is None and env is not None:
        if env.lower() in ("off", "0", "none", ""):
            return ""
        cache_dir = env
    resolved = str(Path(cache_dir or DEFAULT_DIR).expanduser())
    if _enabled_dir == resolved:
        return resolved

    Path(resolved).mkdir(parents=True, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", resolved)
    # Cache everything: the default floors (1 s compile time / small-entry
    # skip) would drop exactly the many medium-sized bucket variants whose
    # sum is the 15-minute warmup.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled_dir = resolved
    return resolved
