"""t-digest — from-scratch numpy implementation (north_rule companion
sketch). Merging-digest variant (Dunning & Ertl): centroids sorted by
mean, cluster sizes governed by the k1 scale function so accuracy
concentrates at the tails.

This implementation bins centroids at *fixed* q-space boundaries
derived from the scale function (q_i = (sin(π·(2i/δ − 1)/2)+1)/2),
which makes compression fully vectorized (digitize + bincount — no
per-centroid Python loop) and deterministic for a given input order.
Merges are associative within the algorithm's accuracy envelope:
estimates are stable under merge reordering within the published
quantile error (tested), though not bit-identical — the same caveat
as every t-digest.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"DBTD"
_HDR = struct.Struct("<4sHHIddQ")  # magic, ver, pad, delta, min, max, n_centroids


def _q_boundaries(delta: int) -> np.ndarray:
    i = np.arange(1, delta, dtype=np.float64)
    return (np.sin(np.pi * (2.0 * i / delta - 1.0) / 2.0) + 1.0) / 2.0


class TDigest:
    __slots__ = ("delta", "means", "weights", "vmin", "vmax", "_buf_v", "_buf_w")

    def __init__(self, delta: int = 200, _means=None, _weights=None,
                 vmin: float = np.inf, vmax: float = -np.inf):
        self.delta = int(delta)
        self.means = np.empty(0, np.float64) if _means is None else _means
        self.weights = np.empty(0, np.float64) if _weights is None else _weights
        self.vmin = vmin
        self.vmax = vmax
        self._buf_v: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []

    # ---- updates ---------------------------------------------------------

    def add(self, values, weights=None) -> None:
        v = np.asarray(values, dtype=np.float64)
        mask = ~np.isnan(v)
        v = v[mask]
        if len(v) == 0:
            return
        # apply the same NaN mask to weights — filtering only values
        # would silently misalign (value, weight) pairs
        w = (
            np.ones(len(v), np.float64)
            if weights is None
            else np.asarray(weights, dtype=np.float64)[mask]
        )
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self._buf_v.append(v)
        self._buf_w.append(w)
        if sum(len(b) for b in self._buf_v) >= 16 * self.delta:
            self._compress()

    def _compress(self) -> None:
        if self._buf_v:
            v = np.concatenate([self.means] + self._buf_v)
            w = np.concatenate([self.weights] + self._buf_w)
            self._buf_v, self._buf_w = [], []
        else:
            v, w = self.means, self.weights
        if len(v) == 0:
            return
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        total = w.sum()
        # centroid midpoint quantiles → fixed k-space bins
        cum = np.cumsum(w) - 0.5 * w
        bins = np.digitize(cum / total, _q_boundaries(self.delta))
        nb = int(bins[-1]) + 1
        wsum = np.bincount(bins, weights=w, minlength=nb)
        vsum = np.bincount(bins, weights=v * w, minlength=nb)
        nz = wsum > 0
        self.means = vsum[nz] / wsum[nz]
        self.weights = wsum[nz]

    # ---- queries ---------------------------------------------------------

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum()) + float(
            sum(b.sum() for b in self._buf_w) if self._buf_w else 0.0
        )

    def quantile(self, q) -> np.ndarray:
        """Interpolated quantile estimate(s) for q in [0, 1]."""
        self._compress()
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if len(self.means) == 0:
            return np.full(len(qs), np.nan)
        if len(self.means) == 1:
            return np.full(len(qs), self.means[0])
        w = self.weights
        total = w.sum()
        # centroid midpoints in cumulative-weight space, with min/max anchors
        cum = np.cumsum(w) - 0.5 * w
        xs = np.concatenate(([0.0], cum, [total]))
        ys = np.concatenate(([self.vmin], self.means, [self.vmax]))
        return np.interp(qs * total, xs, ys)

    def cdf(self, x) -> np.ndarray:
        self._compress()
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if len(self.means) == 0:
            return np.full(len(xs), np.nan)
        w = self.weights
        total = w.sum()
        cum = np.cumsum(w) - 0.5 * w
        grid_x = np.concatenate(([self.vmin], self.means, [self.vmax]))
        grid_q = np.concatenate(([0.0], cum / total, [1.0]))
        return np.interp(xs, grid_x, grid_q)

    # ---- merge / serde ---------------------------------------------------

    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("cannot merge t-digests with different delta")
        self._compress()
        other._compress()
        out = TDigest(
            self.delta,
            _means=np.concatenate([self.means, other.means]),
            _weights=np.concatenate([self.weights, other.weights]),
            vmin=min(self.vmin, other.vmin),
            vmax=max(self.vmax, other.vmax),
        )
        out._compress()
        return out

    def to_bytes(self) -> bytes:
        self._compress()
        return (
            _HDR.pack(_MAGIC, 1, 0, self.delta, self.vmin, self.vmax, len(self.means))
            + self.means.tobytes()
            + self.weights.tobytes()
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        magic, _v, _p, delta, vmin, vmax, n = _HDR.unpack_from(blob, 0)
        if magic != _MAGIC:
            raise ValueError("not a t-digest blob")
        off = _HDR.size
        means = np.frombuffer(blob, np.float64, count=n, offset=off).copy()
        weights = np.frombuffer(blob, np.float64, count=n, offset=off + 8 * n).copy()
        return cls(delta, _means=means, _weights=weights, vmin=vmin, vmax=vmax)

    def __repr__(self):
        return (
            f"TDigest(delta={self.delta}, centroids={len(self.means)}, "
            f"total_weight={self.total_weight:g})"
        )
