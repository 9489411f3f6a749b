"""KMV / theta sketch — from-scratch numpy implementation.

Keeps the k smallest distinct 64-bit murmur hash values of the keys
seen (Bar-Yossef et al. 2002 "Counting distinct elements in a data
stream"; the theta-sketch framing is Dasgupta et al. 2016). Unlike the
builtin wrap in operators/builtin_sketches.py, this one exposes the
retained values, which is what makes SET ALGEBRA work: intersection
and difference cardinalities come from comparing retained values below
a common threshold θ — no join over the raw data.

Merge is EXACTLY associative and merge-order invariant at the byte
level: the union's k smallest values are the k smallest of any
partial union's k smallest (dropping rank>k elements is always safe),
so distributed builds are bit-identical to single-node builds — the
same property the counting-bloom counter-sum merge provides.

Estimator: with fewer than k retained values the sketch is exact
(whp, modulo 64-bit hash collisions); when full,
E[distinct] ≈ (k−1) / θ where θ = kth-smallest / 2^64.
"""

from __future__ import annotations

import struct

import numpy as np

from dablooms_spark.functions.murmur import (
    DABLOOMS_SEED,
    murmur3_x64_128,
    murmur3_x64_128_buffer,
)

_MAGIC = b"DBTH"
_HDR = struct.Struct("<4sHHIQQ")  # magic, ver, pad, k, seed, n_retained
_FULL = float(1 << 64)


class ThetaSketch:
    __slots__ = ("k", "seed", "values")

    def __init__(self, k: int = 4096, seed: int = DABLOOMS_SEED, _values=None):
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = int(k)
        # normalize to u64 up front: to_bytes stores the seed masked,
        # so an unnormalized (e.g. negative) live seed would round-trip
        # to a different value and _check would refuse the merge
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        # sorted ascending uint64, len <= k, distinct
        self.values = (
            np.empty(0, np.uint64) if _values is None else _values
        )

    # ---- updates ---------------------------------------------------------

    def _absorb(self, h: np.ndarray) -> None:
        merged = np.union1d(self.values, h)  # sorted distinct
        self.values = merged[: self.k]

    def add(self, keys) -> None:
        if len(keys) == 0:
            return
        h1, _h2 = murmur3_x64_128(keys, self.seed)
        self._absorb(h1.astype(np.uint64))

    def add_buffer(self, buf, offsets, lengths) -> None:
        h1, _h2 = murmur3_x64_128_buffer(buf, offsets, lengths, self.seed)
        if len(h1):
            self._absorb(h1.astype(np.uint64))

    # ---- estimates -------------------------------------------------------

    @property
    def theta(self) -> float:
        """Sampling threshold in (0, 1]: 1 while not full, else the
        kth smallest normalized hash."""
        if len(self.values) < self.k:
            return 1.0
        return float(self.values[-1]) / _FULL

    def estimate(self) -> float:
        if len(self.values) < self.k:
            return float(len(self.values))
        return (self.k - 1) / self.theta

    # ---- set algebra -----------------------------------------------------

    def intersect_estimate(self, other: "ThetaSketch") -> float:
        """|A ∩ B| from retained values below the common θ."""
        self._check(other)
        theta = min(self.theta, other.theta)
        cut = np.uint64(int(theta * _FULL) - 1) if theta < 1.0 else None
        a, b = self.values, other.values
        if cut is not None:
            a = a[a <= cut]
            b = b[b <= cut]
        common = len(np.intersect1d(a, b))
        return common / theta

    def difference_estimate(self, other: "ThetaSketch") -> float:
        """|A \\ B| — elements of A not in B."""
        self._check(other)
        theta = min(self.theta, other.theta)
        cut = np.uint64(int(theta * _FULL) - 1) if theta < 1.0 else None
        a, b = self.values, other.values
        if cut is not None:
            a = a[a <= cut]
            b = b[b <= cut]
        only = len(np.setdiff1d(a, b, assume_unique=True))
        return only / theta

    def union_estimate(self, other: "ThetaSketch") -> float:
        return self.merge(other).estimate()

    # ---- merge / serde ---------------------------------------------------

    def _check(self, other: "ThetaSketch") -> None:
        if (self.k, self.seed) != (other.k, other.seed):
            raise ValueError("cannot combine theta sketches with different k/seed")

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        self._check(other)
        merged = np.union1d(self.values, other.values)[: self.k]
        return ThetaSketch(self.k, self.seed, _values=merged)

    def to_bytes(self) -> bytes:
        return (
            _HDR.pack(
                _MAGIC, 1, 0, self.k,
                self.seed & 0xFFFFFFFFFFFFFFFF, len(self.values),
            )
            + self.values.tobytes()
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ThetaSketch":
        magic, _v, _p, k, seed, n = _HDR.unpack_from(blob, 0)
        if magic != _MAGIC:
            raise ValueError("not a theta sketch blob")
        vals = np.frombuffer(blob, dtype=np.uint64, count=n, offset=_HDR.size).copy()
        return cls(k, seed, _values=vals)

    def __repr__(self):
        return f"ThetaSketch(k={self.k}, retained={len(self.values)}, est={self.estimate():.1f})"
