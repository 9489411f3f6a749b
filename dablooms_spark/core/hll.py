"""HyperLogLog — from-scratch numpy implementation (north_rule
companion sketch; absent from the reference, which only answers
membership). Registers follow Flajolet et al. 2007; merge =
elementwise register max, which is associative, commutative, and
idempotent — merged registers are bit-identical under any merge tree.

The ESTIMATOR is Ertl's improved raw estimator (Otmar Ertl, "New
cardinality estimation algorithms for HyperLogLog sketches",
arXiv:1702.01284, Alg. 6): a closed-form maximum-likelihood-motivated
correction that removes the FM07 bias across the whole range —
including the 2.5m–5m transition band that HyperLogLog++ (Heule et
al. 2013) patches with ~60 KB of empirical interpolation tables — with
no tables and no range switching (the σ term subsumes linear counting
for small n, the τ term handles saturation). Cross-checked in pytest
against the JVM Datasketches HLL estimates wrapped in
operators/builtin_sketches.py.

Register assignment uses the same MurmurHash3_x64_128 kernel as the
bloom filters: index = top p bits of the first 64-bit word, rank =
1 + leading-zeros of the remaining bits.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from dablooms_spark.functions.murmur import (
    DABLOOMS_SEED,
    murmur3_x64_128,
    murmur3_x64_128_buffer,
)

_MAGIC = b"DBHL"
_HDR = struct.Struct("<4sHBBIQ")  # magic, version, p, pad, pad32, seed


def _sigma(x: float) -> float:
    """σ(x) = x + Σ_{k≥1} x^{2^k}·2^{k−1} (Ertl Alg. 6 helper; the
    small-range / linear-counting term). Converges in ≤ ~60 doublings."""
    if x == 1.0:
        return float("inf")
    y = 1.0
    z = x
    while True:
        x = x * x
        z_prev = z
        z += x * y
        y += y
        if z == z_prev or x == 0.0:
            return z


def _tau(x: float) -> float:
    """τ(x) = ⅓(1 − x − Σ_{k≥1} (1−x^{2^−k})²·2^{−k}) (Ertl Alg. 6
    helper; the register-saturation term)."""
    if x == 0.0 or x == 1.0:
        return 0.0
    y = 1.0
    z = 1.0 - x
    while True:
        x = math.sqrt(x)
        z_prev = z
        y *= 0.5
        z -= (1.0 - x) ** 2 * y
        if z == z_prev:
            return z / 3.0


_ALPHA_INF = 1.0 / (2.0 * math.log(2.0))


class HyperLogLog:
    __slots__ = ("p", "m", "registers", "seed")

    def __init__(self, p: int = 14, seed: int = DABLOOMS_SEED, _registers=None):
        if not (4 <= p <= 18):
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.seed = seed
        self.registers = (
            np.zeros(self.m, dtype=np.uint8) if _registers is None else _registers
        )

    # ---- updates ---------------------------------------------------------

    def _update_words(self, w: np.ndarray) -> None:
        if len(w) == 0:
            return
        idx = (w >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (w << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = 1 + count of leading zeros in the remaining 64-p bits;
        # the OR above plants a stop bit so rank <= 64-p+1.
        # leading zeros via bit-length: clz = 64 - bit_length(rest)
        bl = np.zeros(len(w), dtype=np.uint8)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = v >= (np.uint64(1) << np.uint64(shift))
            bl[big] += shift
            v = np.where(big, v >> np.uint64(shift), v)
        bl += (v == 1).astype(np.uint8)  # bit_length contribution of last bit
        rank = (64 - bl + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def add(self, keys) -> None:
        w, _ = murmur3_x64_128(keys, self.seed)
        self._update_words(w)

    def add_buffer(self, buf, offsets, lengths) -> None:
        w, _ = murmur3_x64_128_buffer(buf, offsets, lengths, self.seed)
        self._update_words(w)

    # ---- estimate --------------------------------------------------------

    def estimate(self) -> float:
        """Ertl's improved raw estimator (arXiv:1702.01284 Alg. 6):
        E = α∞·m² / (m·σ(C₀/m) + Σ_{k=1..q} C_k·2^{−k} + 2^{−q}·m·τ(1−C_{q+1}/m))
        computed with the Horner loop over the register multiplicity
        vector C. Relative standard error ≈ 1.04/√m over the whole
        range, with none of FM07's transition-band bias."""
        m = self.m
        q = 64 - self.p  # stop bit caps ranks at q + 1
        counts = np.bincount(self.registers, minlength=q + 2)
        z = m * _tau(1.0 - counts[q + 1] / m)
        for k in range(q, 0, -1):
            z = 0.5 * (z + counts[k])
        z += m * _sigma(counts[0] / m)
        return _ALPHA_INF * m * m / z

    # ---- merge / serde ---------------------------------------------------

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if self.p != other.p or self.seed != other.seed:
            raise ValueError("cannot merge HLLs with different p/seed")
        return HyperLogLog(
            self.p, self.seed, _registers=np.maximum(self.registers, other.registers)
        )

    def to_bytes(self) -> bytes:
        return (
            _HDR.pack(_MAGIC, 1, self.p, 0, 0, self.seed & 0xFFFFFFFFFFFFFFFF)
            + self.registers.tobytes()
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HyperLogLog":
        magic, _v, p, _pad, _pad32, seed = _HDR.unpack_from(blob, 0)
        if magic != _MAGIC:
            raise ValueError("not an HLL blob")
        regs = np.frombuffer(blob, dtype=np.uint8, offset=_HDR.size).copy()
        return cls(p, seed, _registers=regs)

    def __repr__(self):
        return f"HyperLogLog(p={self.p}, estimate={self.estimate():.1f})"
