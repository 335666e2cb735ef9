"""Speed-of-light roofline accounting for TPU kernels.

The reference's profiling story is wall-clock timers + CUDA memory probes;
on TPU the useful discipline is comparing measured kernel time against the
hardware bound max(flops/peak_flops, bytes/peak_bw). Chip specs are
overridable for other generations.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ChipSpec:
    name: str
    peak_bf16_tflops: float
    peak_f32_tflops: float
    hbm_gb_per_s: float
    hbm_gb: float
    vmem_mb: float


TPU_V5E = ChipSpec("TPU v5e", 197.0, 49.0, 819.0, 16.0, 128.0)
TPU_V5P = ChipSpec("TPU v5p", 459.0, 115.0, 2765.0, 95.0, 128.0)


@dataclass
class KernelRoofline:
    name: str
    flops: float
    bytes_accessed: float
    measured_seconds: float | None = None
    chip: ChipSpec = TPU_V5E
    dtype_tflops: str = "bf16"

    @property
    def compute_bound_seconds(self) -> float:
        peak = (
            self.chip.peak_bf16_tflops
            if self.dtype_tflops == "bf16"
            else self.chip.peak_f32_tflops
        )
        return self.flops / (peak * 1e12)

    @property
    def memory_bound_seconds(self) -> float:
        return self.bytes_accessed / (self.chip.hbm_gb_per_s * 1e9)

    @property
    def speed_of_light_seconds(self) -> float:
        return max(self.compute_bound_seconds, self.memory_bound_seconds)

    @property
    def bound(self) -> str:
        return (
            "compute"
            if self.compute_bound_seconds >= self.memory_bound_seconds
            else "memory"
        )

    @property
    def fraction_of_sol(self) -> float | None:
        """measured / speed-of-light (1.0 = at the hardware bound)."""
        if self.measured_seconds is None:
            return None
        return self.speed_of_light_seconds / self.measured_seconds

    def report(self) -> dict:
        return {
            "kernel": self.name,
            "bound": self.bound,
            "sol_ms": self.speed_of_light_seconds * 1e3,
            "measured_ms": None if self.measured_seconds is None else self.measured_seconds * 1e3,
            "fraction_of_sol": self.fraction_of_sol,
            "arithmetic_intensity": self.flops / max(self.bytes_accessed, 1.0),
        }


def embedding_adamw_roofline(num_items: int, dim: int, measured_seconds=None) -> KernelRoofline:
    """The fused AdamW kernel: 4 reads + 3 writes of the [V, D] f32 table."""
    bytes_ = 7 * num_items * dim * 4
    return KernelRoofline(
        "fused_embedding_adamw", flops=num_items * dim * 12, bytes_accessed=bytes_,
        measured_seconds=measured_seconds, dtype_tflops="f32",
    )


def scorer_roofline(batch: int, num_items: int, dim: int, measured_seconds=None) -> KernelRoofline:
    """Full-catalog scoring matmul + top-k read."""
    flops = 2.0 * batch * num_items * dim
    bytes_ = (num_items * dim + batch * dim + 2 * batch * num_items) * 4
    return KernelRoofline(
        "full_catalog_scorer", flops=flops, bytes_accessed=bytes_,
        measured_seconds=measured_seconds,
    )
