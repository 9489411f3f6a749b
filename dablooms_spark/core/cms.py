"""Count-min sketch — from-scratch numpy implementation (north_rule
companion sketch). A d×w matrix of int64 counters; row i indexes by
the Kirsch–Mitzenmacher expansion of the same Murmur3_x64_128 words
the bloom filters use — (h1 + i*h2) mod w with 64-bit words here,
since w can exceed 2^32 at scale.

Guarantees (Cormode & Muthukrishnan 2005): point estimates never
underestimate; overestimate ≤ ε·N with probability ≥ 1−δ for
w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉. Merge = elementwise matrix sum —
associative, commutative, bit-identical under any merge tree.
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

_MAGIC = b"DBCM"
_HDR = struct.Struct("<4sHBBIIIQq")  # magic, ver, pad, pad, d, w, pad, seed, total


class CountMinSketch:
    __slots__ = ("depth", "width", "table", "total", "seed")

    def __init__(
        self,
        depth: int | None = None,
        width: int | None = None,
        eps: float | None = None,
        delta: float | None = None,
        seed: int = DABLOOMS_SEED,
        _table=None,
        _total: int = 0,
    ):
        if depth is None or width is None:
            if eps is None or delta is None:
                raise ValueError("need (depth,width) or (eps,delta)")
            width = int(math.ceil(math.e / eps))
            depth = int(math.ceil(math.log(1.0 / delta)))
        self.depth = int(depth)
        self.width = int(width)
        self.seed = seed
        self.total = int(_total)
        self.table = (
            np.zeros((self.depth, self.width), dtype=np.int64)
            if _table is None
            else _table
        )

    # ---- indexing --------------------------------------------------------

    def _indexes(self, w1: np.ndarray, w2: np.ndarray) -> np.ndarray:
        """(n, depth) column indices: (w1 + i*w2) mod width, uint64 wrap."""
        i = np.arange(self.depth, dtype=np.uint64)
        with np.errstate(over="ignore"):
            mixed = w1[:, None] + i[None, :] * w2[:, None]
        return (mixed % np.uint64(self.width)).astype(np.int64)

    # ---- updates ---------------------------------------------------------

    def _update_words(self, w1, w2, counts: np.ndarray | None) -> None:
        n = len(w1)
        if n == 0:
            return
        idx = self._indexes(w1, w2)
        rows = np.broadcast_to(
            np.arange(self.depth, dtype=np.int64)[None, :], idx.shape
        )
        if counts is None:
            np.add.at(self.table, (rows.ravel(), idx.ravel()), 1)
            self.total += n
        else:
            c = np.broadcast_to(
                np.asarray(counts, dtype=np.int64)[:, None], idx.shape
            )
            np.add.at(self.table, (rows.ravel(), idx.ravel()), c.ravel())
            self.total += int(np.sum(counts))

    def add(self, keys, counts=None) -> None:
        w1, w2 = murmur3_x64_128(keys, self.seed)
        self._update_words(w1, w2, counts)

    def add_buffer(self, buf, offsets, lengths, counts=None) -> None:
        w1, w2 = murmur3_x64_128_buffer(buf, offsets, lengths, self.seed)
        self._update_words(w1, w2, counts)

    # ---- queries ---------------------------------------------------------

    def query(self, keys) -> np.ndarray:
        """Point-frequency estimates (never underestimates)."""
        w1, w2 = murmur3_x64_128(keys, self.seed)
        if len(w1) == 0:
            return np.empty(0, dtype=np.int64)
        idx = self._indexes(w1, w2)
        rows = np.arange(self.depth, dtype=np.int64)[None, :]
        return self.table[rows, idx].min(axis=1)

    def query_buffer(self, buf, offsets, lengths) -> np.ndarray:
        """Vectorized point estimates over a flat byte buffer + offsets
        (Arrow string/binary layout) — the zero-copy twin of query()."""
        w1, w2 = murmur3_x64_128_buffer(buf, offsets, lengths, self.seed)
        if len(w1) == 0:
            return np.empty(0, dtype=np.int64)
        idx = self._indexes(w1, w2)
        rows = np.arange(self.depth, dtype=np.int64)[None, :]
        return self.table[rows, idx].min(axis=1)

    def inner_product(self, other: "CountMinSketch") -> int:
        """Join-size estimate: Σ_k f_self(k)·f_other(k) ≈ the row count
        of an inner join on the sketched key (Cormode & Muthukrishnan
        2005 §4.2) — never underestimates, error ≤ ε·N_self·N_other
        w.p. ≥ 1−δ. min over rows of the per-row table dot products."""
        if (self.depth, self.width, self.seed) != (
            other.depth,
            other.width,
            other.seed,
        ):
            raise ValueError("cannot inner-product CMS with different geometry/seed")
        per_row = (self.table * other.table).sum(axis=1)
        return int(per_row.min())

    # ---- merge / serde ---------------------------------------------------

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.depth, self.width, self.seed) != (other.depth, other.width, other.seed):
            raise ValueError("cannot merge CMS with different geometry/seed")
        return CountMinSketch(
            self.depth,
            self.width,
            seed=self.seed,
            _table=self.table + other.table,
            _total=self.total + other.total,
        )

    def to_bytes(self) -> bytes:
        return (
            _HDR.pack(
                _MAGIC, 1, 0, 0, self.depth, self.width, 0,
                self.seed & 0xFFFFFFFFFFFFFFFF, self.total,
            )
            + self.table.tobytes()
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountMinSketch":
        magic, _v, _p1, _p2, d, w, _p3, seed, total = _HDR.unpack_from(blob, 0)
        if magic != _MAGIC:
            raise ValueError("not a CMS blob")
        table = (
            np.frombuffer(blob, dtype=np.int64, offset=_HDR.size)
            .reshape(d, w)
            .copy()
        )
        return cls(d, w, seed=seed, _table=table, _total=total)

    def __repr__(self):
        return f"CountMinSketch(d={self.depth}, w={self.width}, total={self.total})"
