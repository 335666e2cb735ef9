"""Validation-gate tests in isolation (parity with reference tests/serving/test_validation.py:18-67)."""

import pytest

from gat_recommendation_tpu.serving.config import ServingLimits
from gat_recommendation_tpu.serving.validation import (
    InputValidationError,
    validate_request,
)


class Req:
    def __init__(self, session_items, k=None):
        self.session_items = session_items
        self.k = k


LIMITS = ServingLimits()
NUM_ITEMS = 100


def test_pass_through():
    v = validate_request(Req([1, 2, 3], k=5), NUM_ITEMS, LIMITS)
    assert v.session_items == [1, 2, 3]
    assert v.k == 5
    assert v.dropped_items == [] and not v.truncated


def test_empty_rejected():
    with pytest.raises(InputValidationError):
        validate_request(Req([]), NUM_ITEMS, LIMITS)


def test_all_unknown_rejected():
    with pytest.raises(InputValidationError):
        validate_request(Req([500, -1, 1000]), NUM_ITEMS, LIMITS)


def test_drop_preserves_order():
    v = validate_request(Req([5, 500, 3, -2, 7]), NUM_ITEMS, LIMITS)
    assert v.session_items == [5, 3, 7]
    assert v.dropped_items == [500, -2]


def test_k_default_and_clamp():
    assert validate_request(Req([1]), NUM_ITEMS, LIMITS).k == LIMITS.default_k
    assert validate_request(Req([1], k=10_000), NUM_ITEMS, LIMITS).k == min(
        LIMITS.max_k, NUM_ITEMS - 1
    )
    with pytest.raises(InputValidationError):
        validate_request(Req([1], k=0), NUM_ITEMS, LIMITS)
    with pytest.raises(InputValidationError):
        validate_request(Req([1], k=-3), NUM_ITEMS, LIMITS)


def test_truncation_keeps_most_recent():
    items = list(range(1, 61))
    v = validate_request(Req(items), NUM_ITEMS, LIMITS)
    assert v.truncated
    assert len(v.session_items) == LIMITS.max_session_length
    assert v.session_items == items[-LIMITS.max_session_length :]


def test_bool_rejected():
    with pytest.raises(InputValidationError):
        validate_request(Req([1, True, 3]), NUM_ITEMS, LIMITS)


def test_non_int_rejected():
    with pytest.raises(InputValidationError):
        validate_request(Req([1, "2", 3]), NUM_ITEMS, LIMITS)
