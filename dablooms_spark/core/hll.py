"""HyperLogLog — from-scratch numpy implementation (north_rule
companion sketch; absent from the reference, which only answers
membership). Standard HLL (Flajolet et al. 2007) with the small-range
linear-counting correction; merge = elementwise register max, which is
associative, commutative, and idempotent — merged registers are
bit-identical under any merge tree.

Register assignment uses the same MurmurHash3_x64_128 kernel as the
bloom filters: index = top p bits of the first 64-bit word, rank =
1 + leading-zeros of the remaining bits.
"""

from __future__ import annotations

import struct

import numpy as np

from dablooms_spark.functions.murmur import (
    DABLOOMS_SEED,
    murmur3_x64_128,
    murmur3_x64_128_buffer,
)

_MAGIC = b"DBHL"
_HDR = struct.Struct("<4sHBBIQ")  # magic, version, p, pad, pad32, seed


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


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
        m = self.m
        regs = self.registers.astype(np.float64)
        raw = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        zeros = int(np.count_nonzero(self.registers == 0))
        if raw <= 2.5 * m and zeros:
            return m * float(np.log(m / zeros))  # linear counting
        return float(raw)

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
