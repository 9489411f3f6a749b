"""Bloom filter geometry — the reference's sizing formulas.

Public dablooms `counting_bloom_init` (src/dablooms.c:≈270):

    nfuncs          = ceil(log2(1 / error_rate))
    counts_per_func = ceil(capacity * |ln error_rate| / (nfuncs * ln^2 2))
    size            = nfuncs * counts_per_func
    nibble bytes    = ceil(size / 2)      (two 4-bit counters per byte)

Shared by the build and probe sides so indices always agree.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

# src/dablooms.c:≈19 — per-layer error tightening for scaling filters.
ERROR_TIGHTENING_RATIO = 0.5


@dataclass(frozen=True)
class BloomGeometry:
    capacity: int
    error_rate: float

    def __post_init__(self):
        if not (0.0 < self.error_rate < 1.0):
            raise ValueError(f"error_rate must be in (0,1), got {self.error_rate}")
        if self.capacity < 1:
            raise ValueError(f"capacity must be >= 1, got {self.capacity}")

    @property
    def nfuncs(self) -> int:
        return int(math.ceil(math.log(1.0 / self.error_rate) / math.log(2.0)))

    @property
    def counts_per_func(self) -> int:
        return int(
            math.ceil(
                self.capacity
                * abs(math.log(self.error_rate))
                / (self.nfuncs * math.log(2.0) ** 2)
            )
        )

    @property
    def size(self) -> int:
        """Total 4-bit counters across all bands."""
        return self.nfuncs * self.counts_per_func

    @property
    def num_nibble_bytes(self) -> int:
        return (self.size + 1) // 2

    def tightened(self, layer_index: int) -> "BloomGeometry":
        """Geometry of scaling-filter layer `layer_index` (0-based):
        error = error_rate * ERROR_TIGHTENING_RATIO^(layer_index+1),
        same capacity per layer (new_counting_bloom_from_scale,
        src/dablooms.c:≈352 — layers grow in count, not in size)."""
        return BloomGeometry(
            capacity=self.capacity,
            error_rate=self.error_rate * ERROR_TIGHTENING_RATIO ** (layer_index + 1),
        )
