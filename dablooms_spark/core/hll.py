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

SPARSE MODE (HyperLogLog(p, sparse=True), blob version 2): below
m/8 distinct keys the sketch stores the sorted-unique 64-bit hash
words themselves instead of registers — the representation HLL++
(Heule, Nunkesser, Hall, "HyperLogLog in Practice", EDBT 2013 §5.3)
motivates: a sparse sketch is both SMALLER than the register array
and EXACT, since estimate() = the number of distinct words (exact up
to 64-bit hash collisions — the theta sketch's caveat, ~n²/2⁶⁵).
Unlike HLL++'s (idx, rank) pair encoding at a second precision p',
keeping the full words makes the upgrade lossless: crossing m/8
entries (or merging past it) replays the words into registers, so a
sketch that grew sparse→dense is BIT-IDENTICAL to one built dense
from the start, and any merge order over any mix of modes yields
identical bytes. Dense blobs (version 1) from older builds load
unchanged."""

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
    __slots__ = ("p", "m", "registers", "seed", "words")

    def __init__(
        self,
        p: int = 14,
        seed: int = DABLOOMS_SEED,
        _registers=None,
        sparse: bool = False,
        _words=None,
    ):
        if not (4 <= p <= 18):
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.seed = seed
        if _words is not None:
            self.words = np.asarray(_words, dtype=np.uint64)
            self.registers = None
        elif sparse and _registers is None:
            self.words = np.empty(0, dtype=np.uint64)
            self.registers = None
        else:
            self.words = None
            self.registers = (
                np.zeros(self.m, dtype=np.uint8) if _registers is None else _registers
            )

    # ---- sparse plumbing -------------------------------------------------

    @property
    def is_sparse(self) -> bool:
        return self.words is not None

    @property
    def _sparse_max(self) -> int:
        # one uint64 word = 8 register bytes, so the sparse form never
        # outgrows the dense blob it would replace
        return max(2, self.m >> 3)

    def _as_dense_registers(self) -> np.ndarray:
        if self.registers is not None:
            return self.registers
        tmp = HyperLogLog(self.p, self.seed)
        tmp._update_words_dense(self.words)
        return tmp.registers

    # ---- updates ---------------------------------------------------------

    def _update_words(self, w: np.ndarray) -> None:
        if len(w) == 0:
            return
        if self.words is not None:
            union = np.union1d(self.words, w)  # sorted unique
            if len(union) <= self._sparse_max:
                self.words = union
                return
            # upgrade: replay the full union into registers — identical
            # to having built dense from the start
            self.words = None
            self.registers = np.zeros(self.m, dtype=np.uint8)
            self._update_words_dense(union.astype(np.uint64))
            return
        self._update_words_dense(w)

    def _update_words_dense(self, w: np.ndarray) -> None:
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
        range, with none of FM07's transition-band bias.

        Sparse mode short-circuits: the distinct-word count IS the
        cardinality (exact up to 64-bit collisions)."""
        if self.words is not None:
            return float(len(self.words))
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
        if self.words is not None and other.words is not None:
            out = HyperLogLog(self.p, self.seed, _words=self.words.copy())
            out._update_words(other.words)  # union, densify on overflow
            return out
        return HyperLogLog(
            self.p,
            self.seed,
            _registers=np.maximum(
                self._as_dense_registers(), other._as_dense_registers()
            ),
        )

    def to_bytes(self) -> bytes:
        if self.words is not None:
            return (
                _HDR.pack(_MAGIC, 2, self.p, 0, 0, self.seed & 0xFFFFFFFFFFFFFFFF)
                + self.words.tobytes()
            )
        return (
            _HDR.pack(_MAGIC, 1, self.p, 0, 0, self.seed & 0xFFFFFFFFFFFFFFFF)
            + self.registers.tobytes()
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HyperLogLog":
        magic, ver, p, _pad, _pad32, seed = _HDR.unpack_from(blob, 0)
        if magic != _MAGIC:
            raise ValueError("not an HLL blob")
        if ver == 2:
            words = np.frombuffer(blob, dtype=np.uint64, offset=_HDR.size).copy()
            return cls(p, seed, _words=words)
        regs = np.frombuffer(blob, dtype=np.uint8, offset=_HDR.size).copy()
        return cls(p, seed, _registers=regs)

    def __repr__(self):
        mode = f"sparse[{len(self.words)}]" if self.words is not None else "dense"
        return f"HyperLogLog(p={self.p}, {mode}, estimate={self.estimate():.1f})"
