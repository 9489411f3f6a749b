"""KLL-style quantile sketch — from-scratch numpy implementation
(north_rule companion sketch; Karnin–Lang–Liberty 2016 family).

Levelled compactor structure: level i holds items of weight 2^i; a
full level sorts its buffer and promotes every other item (alternating
offset per compaction — deterministic, no RNG, so a given input order
reproduces bit-identically). Level capacities shrink geometrically
from the top (c^(H-i)·k, c=2/3, floor 8) as in the KLL paper.

Rank/quantile queries materialize the weighted item multiset; merge
concatenates levels then re-compacts. Merge is associative within the
sketch's rank-error envelope (tested under random merge orders).
"""

from __future__ import annotations

import struct

import numpy as np

_C = 2.0 / 3.0
_MAGIC = b"DBKL"
_HDR = struct.Struct("<4sHHqqI")  # magic, ver, pad, k, n, nlevels


class KLLSketch:
    __slots__ = ("k", "levels", "n", "_compact_flip")

    def __init__(self, k: int = 200, levels=None, n: int = 0, flip=None):
        self.k = int(k)
        self.levels: list[np.ndarray] = (
            [np.empty(0, np.float64)] if levels is None else levels
        )
        self.n = int(n)
        self._compact_flip: list[int] = flip if flip is not None else [0]

    def _capacity(self, level: int) -> int:
        height = len(self.levels)
        return max(8, int(np.ceil(self.k * _C ** (height - 1 - level))))

    # ---- updates ---------------------------------------------------------

    def add(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += len(v)
        self._compact_all()

    def _compact_all(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self._capacity(i):
                self._compact_level(i)
            i += 1

    def _compact_level(self, i: int) -> None:
        buf = np.sort(self.levels[i], kind="stable")
        while len(self._compact_flip) <= i:
            self._compact_flip.append(0)
        off = self._compact_flip[i]
        self._compact_flip[i] ^= 1
        promoted = buf[off::2]
        self.levels[i] = np.empty(0, np.float64)
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, np.float64))
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])

    # ---- queries ---------------------------------------------------------

    def _items(self) -> tuple[np.ndarray, np.ndarray]:
        vs, ws = [], []
        for i, lv in enumerate(self.levels):
            if len(lv):
                vs.append(lv)
                ws.append(np.full(len(lv), float(1 << i)))
        if not vs:
            return np.empty(0, np.float64), np.empty(0, np.float64)
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q) -> np.ndarray:
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        v, w = self._items()
        if len(v) == 0:
            return np.full(len(qs), np.nan)
        cum = np.cumsum(w)
        targets = qs * cum[-1]
        idx = np.searchsorted(cum, targets, side="left")
        idx = np.clip(idx, 0, len(v) - 1)
        return v[idx]

    def rank(self, x) -> np.ndarray:
        """Estimated fraction of items <= x."""
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        v, w = self._items()
        if len(v) == 0:
            return np.full(len(xs), np.nan)
        cum = np.concatenate(([0.0], np.cumsum(w)))
        idx = np.searchsorted(v, xs, side="right")
        return cum[idx] / cum[-1]

    # ---- merge / serde ---------------------------------------------------

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if self.k != other.k:
            raise ValueError("cannot merge KLL sketches with different k")
        h = max(len(self.levels), len(other.levels))
        levels = []
        for i in range(h):
            a = self.levels[i] if i < len(self.levels) else np.empty(0, np.float64)
            b = other.levels[i] if i < len(other.levels) else np.empty(0, np.float64)
            levels.append(np.concatenate([a, b]))
        out = KLLSketch(
            self.k,
            levels=levels,
            n=self.n + other.n,
            flip=[0] * h,
        )
        out._compact_all()
        return out

    def to_bytes(self) -> bytes:
        h = len(self.levels)
        flips = (self._compact_flip + [0] * h)[:h]
        parts = [_HDR.pack(_MAGIC, 1, 0, self.k, self.n, h)]
        parts.append(np.asarray(flips, np.uint8).tobytes())
        parts.append(np.asarray([len(lv) for lv in self.levels], np.int64).tobytes())
        parts.extend(lv.tobytes() for lv in self.levels)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLLSketch":
        magic, _v, _p, k, n, h = _HDR.unpack_from(blob, 0)
        if magic != _MAGIC:
            raise ValueError("not a KLL blob")
        off = _HDR.size
        flips = np.frombuffer(blob, np.uint8, count=h, offset=off).tolist()
        off += h
        lens = np.frombuffer(blob, np.int64, count=h, offset=off)
        off += 8 * h
        levels = []
        for ln in lens:
            levels.append(np.frombuffer(blob, np.float64, count=int(ln), offset=off).copy())
            off += 8 * int(ln)
        return cls(k, levels=levels, n=n, flip=[int(f) for f in flips])

    def __repr__(self):
        sizes = [len(lv) for lv in self.levels]
        return f"KLLSketch(k={self.k}, n={self.n}, levels={sizes})"
