"""Request/response shapes (parity with reference etpgt/serving/schemas.py:11-43).

Pydantic when available (first, cheap type layer); a dataclass fallback keeps
the serving stack importable in minimal environments.
"""

from __future__ import annotations

try:
    from pydantic import BaseModel, Field

    class RecommendRequest(BaseModel):
        session_items: list[int] = Field(..., description="Item IDs viewed this session, in order.")
        k: int | None = Field(default=None, description="How many items to recommend.")

    class RecommendResponse(BaseModel):
        recommendations: list[int]
        scores: list[float]
        latency_ms: float
        dropped_items: list[int] = Field(default_factory=list)
        truncated: bool = False

    class HealthResponse(BaseModel):
        status: str
        model_loaded: bool
        num_items: int
        embedding_dim: int

    PYDANTIC = True

except ImportError:  # pragma: no cover - minimal environments
    from dataclasses import dataclass, field

    @dataclass
    class RecommendRequest:  # type: ignore[no-redef]
        session_items: list[int]
        k: int | None = None

    @dataclass
    class RecommendResponse:  # type: ignore[no-redef]
        recommendations: list[int]
        scores: list[float]
        latency_ms: float
        dropped_items: list[int] = field(default_factory=list)
        truncated: bool = False

    @dataclass
    class HealthResponse:  # type: ignore[no-redef]
        status: str
        model_loaded: bool
        num_items: int
        embedding_dim: int

    PYDANTIC = False
