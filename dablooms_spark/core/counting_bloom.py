"""Counting Bloom filter — numpy state + batch kernels.

Semantics follow the public dablooms counting bloom
(src/dablooms.c: `counting_bloom_add` ≈L202, `counting_bloom_remove`
≈L220, `counting_bloom_check` ≈L238, nibble ops `bitmap_increment` /
`bitmap_decrement` / `bitmap_check` ≈L97–170):

- 4-bit saturating counters, two per byte (even counter index → high
  nibble, odd → low nibble, matching `bitmap_increment`'s layout).
- Banded layout: hash function i owns slice [i*cpf, (i+1)*cpf).
- check(key) = AND over all nfuncs counters != 0 → no false negatives.
- Documented deviation: the reference *errors and refuses* an
  increment that would overflow 0x0f (≈L108); we saturate at 15
  instead (and clamp decrements at 0), which preserves the no-false-
  negative invariant and — crucially — makes the counter a saturating
  sum, so distributed counter-sum merge is exact: clip(a,15) ⊕
  clip(b,15) == clip(a+b,15).

In-memory state is the *unpacked* uint8 counter array (one counter
per byte, values 0..15) for fast vectorized kernels; serialization
packs to dablooms-style nibbles with a small self-describing header
(the reference's files are not self-describing — new_*_from_file
src/dablooms.c:≈322 requires the caller to re-supply capacity and
error_rate; we embed them instead so merges can validate geometry).
"""

from __future__ import annotations

import struct

import numpy as np

from dablooms_spark.core.geometry import BloomGeometry
from dablooms_spark.functions.hashing import km_expand, km_indexes
from dablooms_spark.functions.murmur import DABLOOMS_SEED

_MAGIC = b"DBSK"
_VERSION = 1
_KIND_COUNTING = 1
# magic 4s | version u16 | kind u8 | pad u8 | capacity u64 | error f64 |
# nfuncs u32 | pad u32 | counts_per_func u64 | first_id u64 | count u64
_HDR = struct.Struct("<4sHBBQdIIQQQ")


class CountingBloom:
    """One counting-bloom layer with fixed geometry."""

    __slots__ = ("geometry", "counters", "count", "first_id", "seed")

    def __init__(
        self,
        capacity: int,
        error_rate: float,
        first_id: int = 0,
        seed: int = DABLOOMS_SEED,
        _counters: np.ndarray | None = None,
        _count: int = 0,
    ):
        self.geometry = BloomGeometry(capacity, error_rate)
        self.seed = seed
        self.first_id = int(first_id)
        self.count = int(_count)
        if _counters is None:
            self.counters = np.zeros(self.geometry.size, dtype=np.uint8)
        else:
            if _counters.shape != (self.geometry.size,):
                raise ValueError("counter array does not match geometry")
            self.counters = _counters

    # ---- kernels -------------------------------------------------------

    def _indexes(self, keys) -> np.ndarray:
        g = self.geometry
        return km_indexes(keys, g.nfuncs, g.counts_per_func, self.seed)

    def _indexes_hashed(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        g = self.geometry
        return km_expand(h1, h2, g.nfuncs, g.counts_per_func)

    def _apply(self, idx: np.ndarray, delta: int, n: int) -> None:
        acc = np.zeros(self.geometry.size, dtype=np.int32)
        np.add.at(acc, idx.ravel(), delta)
        acc += self.counters
        np.clip(acc, 0, 15, out=acc)
        self.counters = acc.astype(np.uint8)
        self.count += delta * n

    def add(self, keys) -> None:
        """Batch add: scatter +1 on all banded indices, saturating at 15
        (counting_bloom_add ≈L202 → bitmap_increment ≈L97)."""
        if len(keys) == 0:
            return
        self._apply(self._indexes(keys), 1, len(keys))

    def add_hashed(self, h1: np.ndarray, h2: np.ndarray) -> None:
        if len(h1) == 0:
            return
        self._apply(self._indexes_hashed(h1, h2), 1, len(h1))

    def remove(self, keys) -> None:
        """Batch remove: scatter −1, clamped at 0
        (counting_bloom_remove ≈L220 → bitmap_decrement ≈L122)."""
        if len(keys) == 0:
            return
        self._apply(self._indexes(keys), -1, len(keys))

    def remove_hashed(self, h1: np.ndarray, h2: np.ndarray) -> None:
        if len(h1) == 0:
            return
        self._apply(self._indexes_hashed(h1, h2), -1, len(h1))

    def check(self, keys) -> np.ndarray:
        """Batch membership: bool array; True iff every banded counter
        is non-zero (counting_bloom_check ≈L238). Vectorized full
        verdict matrix instead of the reference's branchy early-exit —
        SIMD beats branching at batch scale."""
        if len(keys) == 0:
            return np.empty(0, dtype=bool)
        idx = self._indexes(keys)
        return (self.counters[idx] != 0).all(axis=1)

    def check_hashed(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        if len(h1) == 0:
            return np.empty(0, dtype=bool)
        idx = self._indexes_hashed(h1, h2)
        return (self.counters[idx] != 0).all(axis=1)

    # ---- merge ---------------------------------------------------------

    def compatible(self, other: "CountingBloom") -> bool:
        return (
            self.geometry == other.geometry
            and self.seed == other.seed
            and self.first_id == other.first_id
        )

    def merge(self, other: "CountingBloom") -> "CountingBloom":
        """Associative, commutative saturating counter-sum merge.

        Not implemented by the single-process reference; this is the
        distributed extension (north_rule). Exactness: a counter is
        the saturated number of (key, band) hits; saturating-sum of
        saturated partials equals the saturated total, so a merged
        filter is bit-identical to a single-node build over the union.
        """
        if self.geometry != other.geometry or self.seed != other.seed:
            raise ValueError("cannot merge counting blooms with different geometry")
        merged = np.minimum(
            self.counters.astype(np.int32) + other.counters, 15
        ).astype(np.uint8)
        return CountingBloom(
            self.geometry.capacity,
            self.geometry.error_rate,
            first_id=min(self.first_id, other.first_id),
            seed=self.seed,
            _counters=merged,
            _count=self.count + other.count,
        )

    # ---- serde ---------------------------------------------------------

    def to_bytes(self) -> bytes:
        g = self.geometry
        header = _HDR.pack(
            _MAGIC,
            _VERSION,
            _KIND_COUNTING,
            0,
            g.capacity,
            g.error_rate,
            g.nfuncs,
            0,
            g.counts_per_func,
            self.first_id,
            self.count,
        )
        c = self.counters
        if len(c) % 2:
            c = np.concatenate([c, np.zeros(1, np.uint8)])
        packed = (c[0::2] << 4) | c[1::2]  # even index → high nibble
        return header + packed.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, seed: int = DABLOOMS_SEED) -> "CountingBloom":
        (
            magic,
            version,
            kind,
            _pad,
            capacity,
            error_rate,
            nfuncs,
            _pad2,
            cpf,
            first_id,
            count,
        ) = _HDR.unpack_from(blob, 0)
        if magic != _MAGIC or kind != _KIND_COUNTING:
            raise ValueError("not a counting-bloom blob")
        g = BloomGeometry(capacity, error_rate)
        if g.nfuncs != nfuncs or g.counts_per_func != cpf:
            raise ValueError("blob geometry does not match its config")
        packed = np.frombuffer(blob, dtype=np.uint8, offset=_HDR.size)
        counters = np.empty(len(packed) * 2, dtype=np.uint8)
        counters[0::2] = packed >> 4
        counters[1::2] = packed & 0x0F
        counters = counters[: g.size]
        return cls(
            capacity,
            error_rate,
            first_id=first_id,
            seed=seed,
            _counters=counters.copy(),
            _count=count,
        )

    def __repr__(self):
        g = self.geometry
        return (
            f"CountingBloom(capacity={g.capacity}, error_rate={g.error_rate:g}, "
            f"nfuncs={g.nfuncs}, cpf={g.counts_per_func}, count={self.count}, "
            f"first_id={self.first_id})"
        )
