"""Misra–Gries heavy-hitters summary — from-scratch numpy/pandas
implementation (companion sketch beyond the reference surface, like
theta; dablooms itself has no frequency sketch).

A bounded map of at most `k` (key → counter) entries. Batch updates
pre-aggregate the batch (np.unique over the 128-bit murmur words, so
only per-DISTINCT key bytes are materialized, never per-row Python),
then fold into the map; when the map exceeds `k` entries, the
(k+1)-th largest counter value δ is subtracted from every counter and
non-positive entries are dropped — the "mergeable summaries" form of
the classic algorithm (Agarwal, Cormode, Huang, Phillips, Wei, Yi,
*Mergeable Summaries*, PODS 2012 §3), whose merge is: sum counters
key-wise, then apply the same δ-trim. Guarantees, with E = the
cumulative sum of subtracted δ's (tracked in `max_error`):

  stored(x) ≤ f(x) ≤ stored(x) + E        for every key x
  (absent keys: 0 ≤ f(x) ≤ E)
  E ≤ N / (k + 1)                          (N = total items folded in)

so any key with f(x) > E is guaranteed present — no false negatives
above the error floor. When the TOTAL distinct-key count ≤ k, no trim
ever fires anywhere (every partial holds ≤ k keys too), E stays 0 and
every stored count is EXACT regardless of partitioning or merge
order; this is the sketch's oracle-exact regime. In the trimmed
regime the surviving entry set depends on merge order (like any MG),
but the guarantees above hold for every order.

Distributed use goes through the generic two-phase machinery in
`operators/sketch_agg.py` (partial summary per partition, blob-only
merge shuffle): register via _KINDS["mg"]. Batch pre-aggregation
groups rows by their murmur3_x64_128 words; two distinct keys sharing
a 128-bit hash would merge (same deterministic caveat as the theta
sketch's 64-bit key space, probability ~n²/2¹²⁸).
"""

from __future__ import annotations

import struct

import numpy as np

from dablooms_spark.functions.murmur import (
    DABLOOMS_SEED,
    murmur3_x64_128,
    murmur3_x64_128_buffer,
)

_MAGIC = b"DBMG"
# magic, ver, pad, k, n_entries, total, max_error, seed
# (seed rides in the blob — deserialization ignores caller seeds, so
# the magic-dispatching loads() path reconstructs exactly)
_HDR = struct.Struct("<4sHHqqqqQ")


class MisraGries:
    __slots__ = ("k", "counts", "total", "max_error", "seed")

    def __init__(self, k: int = 1024, seed: int = DABLOOMS_SEED):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.seed = int(seed)
        self.counts: dict[bytes, int] = {}
        self.total = 0
        self.max_error = 0

    # ---- updates ---------------------------------------------------------

    def _fold(self, keys: list[bytes], batch_counts: np.ndarray) -> None:
        c = self.counts
        for key, cnt in zip(keys, batch_counts.tolist()):
            c[key] = c.get(key, 0) + cnt
        self.total += int(batch_counts.sum())
        self._trim()

    def _trim(self) -> None:
        if len(self.counts) <= self.k:
            return
        vals = np.fromiter(self.counts.values(), dtype=np.int64, count=len(self.counts))
        # (k+1)-th largest = the k-th index of the descending sort
        delta = int(np.partition(vals, len(vals) - self.k - 1)[len(vals) - self.k - 1])
        self.counts = {key: n - delta for key, n in self.counts.items() if n > delta}
        self.max_error += delta

    @staticmethod
    def _group_rows(w1: np.ndarray, w2: np.ndarray):
        """Indices of one representative row per distinct 128-bit hash,
        plus per-distinct multiplicities — no per-row Python objects."""
        pair = np.empty((len(w1), 2), dtype=np.uint64)
        pair[:, 0] = w1
        pair[:, 1] = w2
        _uniq, first_idx, cnts = np.unique(
            pair, axis=0, return_index=True, return_counts=True
        )
        return first_idx, cnts.astype(np.int64)

    def add(self, keys, counts=None) -> None:
        enc = [
            k if isinstance(k, bytes) else str(k).encode("utf-8") for k in keys
        ]
        if not enc:
            return
        w1, w2 = murmur3_x64_128(enc, self.seed)
        first_idx, cnts = self._group_rows(w1, w2)
        if counts is not None:
            counts = np.asarray(counts, dtype=np.int64)
            # re-sum the provided weights per distinct hash
            pair = np.empty((len(w1), 2), dtype=np.uint64)
            pair[:, 0] = w1
            pair[:, 1] = w2
            _u, inv = np.unique(pair, axis=0, return_inverse=True)
            cnts = np.bincount(inv, weights=counts).astype(np.int64)
        self._fold([enc[i] for i in first_idx], cnts)

    def add_buffer(self, buf, offsets, lengths, counts=None) -> None:
        w1, w2 = murmur3_x64_128_buffer(buf, offsets, lengths, self.seed)
        if len(w1) == 0:
            return
        if counts is None:
            first_idx, cnts = self._group_rows(w1, w2)
        else:
            pair = np.empty((len(w1), 2), dtype=np.uint64)
            pair[:, 0] = w1
            pair[:, 1] = w2
            _u, first_idx, inv = np.unique(
                pair, axis=0, return_index=True, return_inverse=True
            )
            cnts = np.bincount(
                inv, weights=np.asarray(counts, dtype=np.int64)
            ).astype(np.int64)
        data = np.asarray(buf, dtype=np.uint8)
        keys = [
            data[offsets[i] : offsets[i] + lengths[i]].tobytes() for i in first_idx
        ]
        self._fold(keys, cnts)

    # ---- queries ---------------------------------------------------------

    def query(self, key) -> tuple[int, int]:
        """(lower, upper) bounds on f(key): stored ≤ f ≤ stored + E."""
        kb = key if isinstance(key, bytes) else str(key).encode("utf-8")
        lo = self.counts.get(kb, 0)
        return lo, lo + self.max_error

    def heavy_hitters(self, min_count: int) -> list[tuple[bytes, int, int]]:
        """Every key whose count COULD be ≥ min_count, as
        (key, count_lo, count_hi) sorted by count_lo desc then key.
        No false negatives: any key with true f ≥ min_count and
        min_count > E is in the summary and passes the hi-filter."""
        e = self.max_error
        out = [
            (key, n, n + e)
            for key, n in self.counts.items()
            if n + e >= min_count
        ]
        out.sort(key=lambda t: (-t[1], t[0]))
        return out

    # ---- merge / serde ---------------------------------------------------

    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.k != other.k or self.seed != other.seed:
            raise ValueError("cannot merge MG summaries with different k/seed")
        out = MisraGries(self.k, seed=self.seed)
        out.counts = dict(self.counts)
        for key, n in other.counts.items():
            out.counts[key] = out.counts.get(key, 0) + n
        out.total = self.total + other.total
        out.max_error = self.max_error + other.max_error
        out._trim()
        return out

    def to_bytes(self) -> bytes:
        items = sorted(self.counts.items())  # canonical order
        lens = np.fromiter((len(key) for key, _ in items), dtype=np.int64, count=len(items))
        cnts = np.fromiter((n for _, n in items), dtype=np.int64, count=len(items))
        return (
            _HDR.pack(
                _MAGIC, 1, 0, self.k, len(items), self.total, self.max_error,
                self.seed & 0xFFFFFFFFFFFFFFFF,
            )
            + lens.tobytes()
            + cnts.tobytes()
            + b"".join(key for key, _ in items)
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "MisraGries":
        magic, _v, _p, k, n, total, max_error, seed = _HDR.unpack_from(blob, 0)
        if magic != _MAGIC:
            raise ValueError("not a Misra-Gries blob")
        off = _HDR.size
        lens = np.frombuffer(blob, dtype=np.int64, offset=off, count=n)
        off += 8 * n
        cnts = np.frombuffer(blob, dtype=np.int64, offset=off, count=n)
        off += 8 * n
        out = cls(k, seed=seed)
        pos = off
        counts: dict[bytes, int] = {}
        for i in range(n):
            ln = int(lens[i])
            counts[bytes(blob[pos : pos + ln])] = int(cnts[i])
            pos += ln
        out.counts = counts
        out.total = int(total)
        out.max_error = int(max_error)
        return out

    def __repr__(self):
        return (
            f"MisraGries(k={self.k}, entries={len(self.counts)}, "
            f"total={self.total}, max_error={self.max_error})"
        )
