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
_KIND_COUNTING = 1  # dense nibble payload
_KIND_COUNTING_SPARSE = 2  # u64 nnz + index array + u8 counts
# u64 nnz + u64 gap_len + u64 exc_len + delta-u8 gap stream +
# (pos u32, gap u32) exceptions + u8 counts — ~2 B/counter vs 5 for
# kind 2; only used while size fits u32 exception fields
_KIND_COUNTING_SPARSE_GAPS = 3
# magic 4s | version u16 | kind u8 | flags u8 | capacity u64 | error f64 |
# nfuncs u32 | pad u32 | counts_per_func u64 | first_id u64 | count u64
# flags bit 0: on_overflow == 'error' (strict reference-parity mode) —
# older blobs wrote 0 here, which correctly decodes as 'saturate'
_HDR = struct.Struct("<4sHBBQdIIQQQ")
_FLAG_STRICT_OVERFLOW = 0x01


class CountingBloom:
    """One counting-bloom layer with fixed geometry."""

    __slots__ = ("geometry", "counters", "count", "first_id", "seed", "on_overflow")

    def __init__(
        self,
        capacity: int,
        error_rate: float,
        first_id: int = 0,
        seed: int = DABLOOMS_SEED,
        _counters: np.ndarray | None = None,
        _count: int = 0,
        on_overflow: str = "saturate",
    ):
        if on_overflow not in ("saturate", "error"):
            raise ValueError("on_overflow must be 'saturate' or 'error'")
        self.geometry = BloomGeometry(capacity, error_rate)
        self.seed = seed
        self.first_id = int(first_id)
        self.count = int(_count)
        # "saturate" (default): counters clamp at 15/0 — keeps
        # distributed counter-sum merges exact and associative.
        # "error": reference parity — bitmap_increment (src/dablooms.c
        # ≈L108) REFUSES an increment that would overflow a 4-bit
        # counter, and bitmap_decrement (≈L122) refuses decrementing a
        # zero counter. Batch calls raise atomically (no partial
        # mutation), unlike the reference's per-key error return.
        self.on_overflow = on_overflow
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
        flat = idx.ravel()
        if flat.size * 8 < self.geometry.size:
            # sparse batch relative to the filter: touch only hit
            # counters (full-array sweeps would be memory-bandwidth
            # bound — ~5 sweeps of size*4 bytes per batch kills
            # scaling when capacity >> batch size)
            uniq, counts = np.unique(flat, return_counts=True)
            cur = self.counters[uniq].astype(np.int32)
            if delta >= 0:
                cur += counts.astype(np.int32)
            else:
                cur -= counts.astype(np.int32)
            self._strict_check(cur)
            np.clip(cur, 0, 15, out=cur)
            self.counters[uniq] = cur.astype(np.uint8)
        else:
            acc = np.zeros(self.geometry.size, dtype=np.int32)
            np.add.at(acc, flat, delta)
            acc += self.counters
            self._strict_check(acc)
            np.clip(acc, 0, 15, out=acc)
            self.counters = acc.astype(np.uint8)
        self.count += delta * n

    def _strict_check(self, raw: np.ndarray) -> None:
        """Reference-parity refusal (on_overflow='error'): raise before
        any counter mutation if the batch would overflow a 4-bit
        counter (bitmap_increment ≈L108) or decrement a zero counter
        (bitmap_decrement ≈L122)."""
        if self.on_overflow != "error":
            return
        if raw.max(initial=0) > 15:
            raise OverflowError(
                "increment would overflow a 4-bit counter "
                "(reference bitmap_increment refusal; use "
                "on_overflow='saturate' for mergeable distributed builds)"
            )
        if raw.min(initial=0) < 0:
            raise OverflowError(
                "decrement of a zero counter refused "
                "(reference bitmap_decrement parity)"
            )

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

    def add_buffer(self, buf, offsets, lengths) -> None:
        """Zero-copy Arrow buffer path (same surface as the other
        sketches, so the generic sketch_agg operators can build
        per-group membership filters)."""
        from dablooms_spark.functions.murmur import dablooms_hash_words_buffer

        h1, h2 = dablooms_hash_words_buffer(buf, offsets, lengths, self.seed)
        self.add_hashed(h1, h2)

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

    # ---- cardinality from the counters alone ----------------------------

    def counter_sum(self) -> int:
        """Sum of all 4-bit counters (int64 accumulate)."""
        return int(self.counters.sum(dtype=np.int64))

    def saturated(self) -> bool:
        """True iff any counter currently sits at the 4-bit ceiling —
        a conservative witness that an add MAY have clipped (a counter
        legitimately at 15 also trips it). While this is False, no
        upward clip has ever happened."""
        return bool((self.counters == 15).any())

    def added_count(self) -> tuple[int, bool]:
        """(live adds, exact?) recovered from the counter state alone.

        Every add scatters +1 into exactly nfuncs counters and every
        remove scatters −1 into the same ones, so
        sum(counters) == nfuncs · (adds − removes) EXACTLY while no
        counter has ever clipped (up at 15, or down at 0 by removing a
        key that was never added — the same remove-only-present-keys
        contract dablooms' counting_bloom_remove assumes,
        src/dablooms.c:≈L220). Unlike the header count (dablooms'
        `counting_bloom_add` ≈L202 bumps header->count), the
        counter-sum stays correct under counter-sum merges of
        overlapping partials, because duplicate adds add.

        exact=False when a saturation witness exists or the sum is not
        divisible by nfuncs; the returned value is then a lower bound.
        """
        s = self.counter_sum()
        k = self.geometry.nfuncs
        exact = (not self.saturated()) and s % k == 0
        return s // k, exact

    def density_estimate(self) -> float:
        """Bit-density cardinality (Swamidass & Baldi, J. Chem. Inf.
        Model. 2007): with the banded layout each hash function owns
        its own cpf-slot table, so per band
        n̂_i = −cpf · ln(1 − X_i/cpf) with X_i = nonzero slots in band
        i; average the bands. Works even when counters saturate (it
        only reads zero/nonzero), at estimator (not exact) precision.
        """
        g = self.geometry
        bands = self.counters.reshape(g.nfuncs, g.counts_per_func)
        fill = (bands != 0).sum(axis=1, dtype=np.int64) / float(g.counts_per_func)
        # a completely full band carries no information — clamp instead
        # of returning inf so merged estimates stay finite
        fill = np.minimum(fill, 1.0 - 1e-12)
        return float(np.mean(-g.counts_per_func * np.log1p(-fill)))

    # ---- merge ---------------------------------------------------------

    def compatible(self, other: "CountingBloom") -> bool:
        return (
            self.geometry == other.geometry
            and self.seed == other.seed
            and self.first_id == other.first_id
        )

    @classmethod
    def merge_blobs(cls, blobs: list[bytes], seed: int = DABLOOMS_SEED) -> "CountingBloom":
        """Merge serialized filters without densifying each one: sparse
        payloads scatter-add straight into a single accumulator, dense
        payloads add vectorized. Traffic = one accumulator pass plus
        Σ nnz — the shape a 1000-shard merge needs."""
        first = _HDR.unpack_from(blobs[0], 0)
        (_m, _v, _k, _p, capacity, error_rate, nfuncs, _p2, cpf, _fid, _cnt) = first
        g = BloomGeometry(capacity, error_rate)
        acc = np.zeros(g.size, dtype=np.int32)
        count = 0
        first_id = None
        strict = None
        for blob in blobs:
            (magic, _ver, kind, flags_i, cap_i, err_i, nf_i, _pp, cpf_i, fid_i, cnt_i) = (
                _HDR.unpack_from(blob, 0)
            )
            if magic != _MAGIC or (cap_i, err_i) != (capacity, error_rate):
                raise ValueError("cannot merge counting blooms with different geometry")
            count += cnt_i
            first_id = fid_i if first_id is None else min(first_id, fid_i)
            b_strict = bool(flags_i & _FLAG_STRICT_OVERFLOW)
            if strict is None:
                strict = b_strict
            elif strict != b_strict:
                # see merge(): a saturate blob may carry clipped
                # counters — a mixed merge cannot honestly be strict
                raise ValueError(
                    "cannot merge blobs with different on_overflow modes"
                )
            if kind == _KIND_COUNTING_SPARSE_GAPS:
                idx, vals = cls._decode_sparse_gaps(blob)
                np.add.at(acc, idx, vals.astype(np.int32))
            elif kind == _KIND_COUNTING_SPARSE:
                (nnz,) = struct.unpack_from("<Q", blob, _HDR.size)
                idx_dtype = np.uint64 if g.size > 0xFFFFFFFF else np.uint32
                off = _HDR.size + 8
                idx = np.frombuffer(blob, dtype=idx_dtype, count=nnz, offset=off)
                off += nnz * idx.itemsize
                vals = np.frombuffer(blob, dtype=np.uint8, count=nnz, offset=off)
                np.add.at(acc, idx.astype(np.int64), vals.astype(np.int32))
            else:
                packed = np.frombuffer(blob, dtype=np.uint8, offset=_HDR.size)
                acc[0::2] += packed[: (g.size + 1) // 2] >> 4
                acc[1::2] += (packed[: g.size // 2] & 0x0F).astype(np.int32)
        if strict and acc.max(initial=0) > 15:
            # any strict input makes the merge strict: a cross-shard
            # sum past 15 is the same 4-bit overflow the reference
            # refuses single-node (bitmap_increment ≈L108) — clipping
            # here would silently break remove-safety
            raise OverflowError(
                "merge would overflow a 4-bit counter "
                "(strict on_overflow='error' blob in the merge set)"
            )
        np.clip(acc, 0, 15, out=acc)
        return cls(
            capacity,
            error_rate,
            first_id=first_id or 0,
            seed=seed,
            _counters=acc.astype(np.uint8),
            _count=count,
            on_overflow="error" if strict else "saturate",
        )

    @classmethod
    def merge_many(cls, blooms: list["CountingBloom"]) -> "CountingBloom":
        """Fold many filters with ONE accumulator pass — pairwise
        merge() would allocate and sweep a fresh array per pair."""
        first = blooms[0]
        if len(blooms) == 1:
            return first
        acc = first.counters.astype(np.int32)
        count = first.count
        first_id = first.first_id
        for b in blooms[1:]:
            if b.geometry != first.geometry or b.seed != first.seed:
                raise ValueError("cannot merge counting blooms with different geometry")
            acc += b.counters
            count += b.count
            first_id = min(first_id, b.first_id)
        np.clip(acc, 0, 15, out=acc)
        return cls(
            first.geometry.capacity,
            first.geometry.error_rate,
            first_id=first_id,
            seed=first.seed,
            _counters=acc.astype(np.uint8),
            _count=count,
        )

    def subtract(self, other: "CountingBloom") -> "CountingBloom":
        """Counter-wise subtraction, clamped at 0 — the blob-algebra
        form of a batch remove. `other` is a DELETION-COUNT filter
        (built by adding the deleted keys); subtracting it is exactly
        equivalent to remove()ing those keys one batch at a time:
        counters never exceed 15, so max(c - min(d,15), 0) ==
        max(c - d, 0) for any true multiplicity d. This is what lets a
        10^10-row deletion stream reduce to per-layer blobs in the
        cluster instead of 16 B/row on the driver. Mutates self and
        returns it (mirroring remove_hashed)."""
        if self.geometry != other.geometry or self.seed != other.seed:
            raise ValueError(
                "cannot subtract counting blooms with different geometry"
            )
        cur = self.counters.astype(np.int32)
        cur -= other.counters
        self._strict_check(cur)
        np.clip(cur, 0, 15, out=cur)
        self.counters = cur.astype(np.uint8)
        # floor at 0: over-removal (deleting never-inserted keys) must
        # not drive the count negative — a negative count cannot even
        # serialize (u64 header field)
        self.count = max(self.count - other.count, 0)
        return self

    def merge(self, other: "CountingBloom") -> "CountingBloom":
        """Associative, commutative saturating counter-sum merge.

        Not implemented by the single-process reference; this is the
        distributed extension (north_rule). Exactness: a counter is
        the saturated number of (key, band) hits; saturating-sum of
        saturated partials equals the saturated total, so a merged
        filter is bit-identical to a single-node build over the union.

        Raises: ValueError on geometry/seed/on_overflow mismatch;
        OverflowError when both operands are strict
        (on_overflow='error') and a summed counter would pass 15 —
        strict checkpoints therefore need overflow handling at
        restore/merge time (see sources/checkpoint.py).
        """
        if self.geometry != other.geometry or self.seed != other.seed:
            raise ValueError("cannot merge counting blooms with different geometry")
        if self.on_overflow != other.on_overflow:
            # a saturate-mode operand may already hold clipped counters,
            # so a "strict" merge result could understate true counts —
            # exactly the remove-hazard strict mode exists to prevent.
            # Refuse rather than silently mislabel.
            raise ValueError(
                "cannot merge filters with different on_overflow modes "
                f"({self.on_overflow!r} vs {other.on_overflow!r})"
            )
        strict = self.on_overflow == "error"
        raw = self.counters.astype(np.int32) + other.counters
        if strict and raw.max(initial=0) > 15:
            raise OverflowError(
                "merge would overflow a 4-bit counter "
                "(strict on_overflow='error' operand)"
            )
        merged = np.minimum(raw, 15).astype(np.uint8)
        return CountingBloom(
            self.geometry.capacity,
            self.geometry.error_rate,
            first_id=min(self.first_id, other.first_id),
            seed=self.seed,
            _counters=merged,
            _count=self.count + other.count,
            on_overflow="error" if strict else "saturate",
        )

    # ---- serde ---------------------------------------------------------

    @staticmethod
    def _decode_sparse_gaps(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
        """(absolute int64 indices, u8 counts) from a kind-3 payload."""
        from dablooms_spark.core.codec import delta_decode

        nnz, gl, el = struct.unpack_from("<QQQ", blob, _HDR.size)
        off = _HDR.size + 24
        gaps = blob[off : off + gl]
        off += gl
        exc = blob[off : off + el]
        off += el
        idx = delta_decode(gaps, exc)
        vals = np.frombuffer(blob, dtype=np.uint8, count=nnz, offset=off)
        return idx, vals

    def to_bytes(self) -> bytes:
        """Self-describing blob; picks dense nibble packing (the
        dablooms file layout) or a sparse (index, count) encoding,
        whichever is smaller. Sparse matters at scale: a shard holding
        n keys of a filter sized for N >> n keys has ~n·k nonzero
        counters out of N·k/ln2 — stage-1 partial blobs shrink ~10x,
        which is exactly the bytes the merge shuffle and the driver
        collect pay for."""
        from dablooms_spark.core.codec import delta_encode

        g = self.geometry
        nz = np.flatnonzero(self.counters)
        nnz = len(nz)
        idx_width = 8 if g.size > 0xFFFFFFFF else 4
        sparse_bytes = 8 + nnz * (idx_width + 1)
        gaps_b = exc_b = b""
        gaps_bytes = None
        if g.size <= 0xFFFFFFFF:
            gaps_b, exc_b = delta_encode(nz.astype(np.int64))
            gaps_bytes = 24 + len(gaps_b) + len(exc_b) + nnz
        candidates = [(g.num_nibble_bytes, _KIND_COUNTING),
                      (sparse_bytes, _KIND_COUNTING_SPARSE)]
        if gaps_bytes is not None:
            candidates.append((gaps_bytes, _KIND_COUNTING_SPARSE_GAPS))
        kind = min(candidates)[1]
        flags = _FLAG_STRICT_OVERFLOW if self.on_overflow == "error" else 0
        header = _HDR.pack(
            _MAGIC,
            _VERSION,
            kind,
            flags,
            g.capacity,
            g.error_rate,
            g.nfuncs,
            0,
            g.counts_per_func,
            self.first_id,
            self.count,
        )
        if kind == _KIND_COUNTING_SPARSE_GAPS:
            vals = self.counters[nz]
            return (
                header
                + struct.pack("<QQQ", nnz, len(gaps_b), len(exc_b))
                + gaps_b
                + exc_b
                + vals.tobytes()
            )
        if kind == _KIND_COUNTING_SPARSE:
            vals = self.counters[nz]
            idx = nz.astype(np.uint64 if idx_width == 8 else np.uint32)
            return header + struct.pack("<Q", nnz) + idx.tobytes() + vals.tobytes()
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
            flags,
            capacity,
            error_rate,
            nfuncs,
            _pad2,
            cpf,
            first_id,
            count,
        ) = _HDR.unpack_from(blob, 0)
        if magic != _MAGIC or kind not in (
            _KIND_COUNTING, _KIND_COUNTING_SPARSE, _KIND_COUNTING_SPARSE_GAPS
        ):
            raise ValueError("not a counting-bloom blob")
        g = BloomGeometry(capacity, error_rate)
        if g.nfuncs != nfuncs or g.counts_per_func != cpf:
            raise ValueError("blob geometry does not match its config")
        if kind == _KIND_COUNTING_SPARSE_GAPS:
            idx, vals = cls._decode_sparse_gaps(blob)
            counters = np.zeros(g.size, dtype=np.uint8)
            counters[idx] = vals
        elif kind == _KIND_COUNTING_SPARSE:
            (nnz,) = struct.unpack_from("<Q", blob, _HDR.size)
            idx_dtype = np.uint64 if g.size > 0xFFFFFFFF else np.uint32
            off = _HDR.size + 8
            idx = np.frombuffer(blob, dtype=idx_dtype, count=nnz, offset=off)
            off += nnz * idx.itemsize
            vals = np.frombuffer(blob, dtype=np.uint8, count=nnz, offset=off)
            counters = np.zeros(g.size, dtype=np.uint8)
            counters[idx.astype(np.int64)] = vals
        else:
            packed = np.frombuffer(blob, dtype=np.uint8, offset=_HDR.size)
            counters = np.empty(len(packed) * 2, dtype=np.uint8)
            counters[0::2] = packed >> 4
            counters[1::2] = packed & 0x0F
            counters = counters[: g.size].copy()
        return cls(
            capacity,
            error_rate,
            first_id=first_id,
            seed=seed,
            _counters=counters,
            _count=count,
            on_overflow="error" if flags & _FLAG_STRICT_OVERFLOW else "saturate",
        )

    def __repr__(self):
        g = self.geometry
        return (
            f"CountingBloom(capacity={g.capacity}, error_rate={g.error_rate:g}, "
            f"nfuncs={g.nfuncs}, cpf={g.counts_per_func}, count={self.count}, "
            f"first_id={self.first_id})"
        )
