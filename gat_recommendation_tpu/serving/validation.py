"""The input-validation gate (parity with reference etpgt/serving/validation.py:38-96).

Pure logic: no jax, no web framework. Every request passes through
``validate_request`` BEFORE the model is touched; it returns a bounded
``ValidatedRequest`` or raises ``InputValidationError`` with a caller-safe
message. Rule order preserved: empty check -> bool/int type check -> in-range
filter with dropped-item report -> truncate to most-recent max_session_length
-> k default/clamp.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from gat_recommendation_tpu.serving.config import DEFAULT_LIMITS, ServingLimits


class InputValidationError(ValueError):
    """A request failed validation. The message is safe to return to the caller."""


@dataclass
class ValidatedRequest:
    """A request the model can trust: bounded length, in-range ids, sane k."""

    session_items: list[int]
    k: int
    dropped_items: list[int] = field(default_factory=list)
    truncated: bool = False


def validate_request(
    request,
    num_items: int,
    limits: ServingLimits = DEFAULT_LIMITS,
) -> ValidatedRequest:
    """Sanitize a raw request, or raise InputValidationError."""
    items = request.session_items

    if not items:
        raise InputValidationError("session_items must not be empty.")

    # Guard against bools (bool is an int in Python) and loose coercions.
    for item in items:
        if isinstance(item, bool) or not isinstance(item, int):
            raise InputValidationError(
                f"session_items must be integers; got {item!r} of type {type(item).__name__}."
            )

    valid = [i for i in items if 0 <= i < num_items]
    dropped = [i for i in items if not (0 <= i < num_items)]
    if not valid:
        raise InputValidationError(
            f"no usable item ids in session: all {len(items)} were outside the "
            f"catalog range [0, {num_items})."
        )

    truncated = len(valid) > limits.max_session_length
    if truncated:
        valid = valid[-limits.max_session_length :]

    k = limits.default_k if request.k is None else request.k
    if k < 1:
        raise InputValidationError(f"k must be at least 1; got {k}.")
    k = min(k, limits.max_k, num_items - 1)

    return ValidatedRequest(session_items=valid, k=k, dropped_items=dropped, truncated=truncated)
