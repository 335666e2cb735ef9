"""Serving layer (v2 real-GNN path), re-design of reference etpgt/serving/*.

Layering preserved exactly (SURVEY.md §2.1 'Serving v2'):
frozen limits -> schemas -> pure validation gate -> Recommender -> thin app.
The model forward is the real jitted GNN per request (not the mean-embedding
approximation the reference dev/Vertex servers use — those live under
scripts/serve/).
"""

from gat_recommendation_tpu.serving.config import DEFAULT_LIMITS, ServingLimits
from gat_recommendation_tpu.serving.validation import (
    InputValidationError,
    ValidatedRequest,
    validate_request,
)

__all__ = [
    "ServingLimits",
    "DEFAULT_LIMITS",
    "validate_request",
    "ValidatedRequest",
    "InputValidationError",
]
