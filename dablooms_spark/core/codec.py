"""Sparse-index codec shared by blob serde and merge pieces.

Sorted counter indices compress to ~1 byte each: the average gap
between nonzero counters is size/nnz (≈ ln2·k/α per key at load
factor α), typically well under 256, so u8 gaps plus a rare
(position u32, true-gap u32) exception list replace 4–8 B absolute
indices. Encode and decode are pure vectorized numpy — the same
kernel serves the counter-range merge shuffle pieces
(operators/bloom_build.py) and the _KIND_COUNTING_SPARSE_GAPS blob
layout (core/counting_bloom.py).
"""

from __future__ import annotations

import numpy as np


def delta_encode(local_idx: np.ndarray) -> tuple[bytes, bytes]:
    """Sorted indices → (u8 gap stream, exception pairs)."""
    if len(local_idx) == 0:
        return b"", b""
    gaps = np.diff(local_idx, prepend=np.int64(0))
    gaps[0] = local_idx[0]
    big = gaps >= 255
    out = np.where(big, 255, gaps).astype(np.uint8)
    if big.any():
        pos = np.flatnonzero(big).astype(np.uint32)
        true = gaps[big].astype(np.uint32)
        exc = np.empty(2 * len(pos), dtype=np.uint32)
        exc[0::2] = pos
        exc[1::2] = true
        return out.tobytes(), exc.tobytes()
    return out.tobytes(), b""


def delta_decode(gap_bytes: bytes, exc_bytes: bytes) -> np.ndarray:
    gaps = np.frombuffer(gap_bytes, dtype=np.uint8).astype(np.int64)
    if len(exc_bytes):
        exc = np.frombuffer(exc_bytes, dtype=np.uint32)
        gaps[exc[0::2].astype(np.int64)] = exc[1::2]
    return np.cumsum(gaps)
