"""Cross-cutting utilities (mirrors reference etpgt/utils/__init__.py:1-17)."""

from gat_recommendation_tpu.utils.compile_cache import enable_persistent_cache
from gat_recommendation_tpu.utils.io import load_config, load_json, save_json
from gat_recommendation_tpu.utils.logging import get_logger
from gat_recommendation_tpu.utils.profiler import measure_memory, timer
from gat_recommendation_tpu.utils.seed import set_seed

__all__ = [
    "enable_persistent_cache",
    "load_config",
    "load_json",
    "save_json",
    "get_logger",
    "set_seed",
    "timer",
    "measure_memory",
]
