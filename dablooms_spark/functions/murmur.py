"""Vectorized MurmurHash3_x64_128 (Austin Appleby, public domain).

The reference hashes every key with MurmurHash3_x64_128 under seed
SALT_CONSTANT = 0x97c29b3a and derives two 32-bit words (h1, h2) for
Kirsch–Mitzenmacher double hashing (public dablooms `hash_func`,
src/dablooms.c:≈182; murmur body src/murmur.c). Spark's builtin
`hash()` is Murmur3_x86_32 and `xxhash64` is a different algorithm —
neither matches — and no `mmh3` wheel is available, so we implement
the x64_128 variant as a batch numpy kernel.

Two implementations:

- :func:`murmur3_x64_128_scalar` — straight pure-Python transcription
  of the canonical algorithm; the test oracle (slow path).
- :func:`murmur3_x64_128` — vectorized over a whole batch of byte
  strings. Strategy: concatenate all keys into one uint8 buffer, sort
  rows descending by 16-byte block count, then for block j gather the
  j-th block of every row that has one (a descending-sorted prefix) —
  total gather work is exactly total_bytes/16 block rows, no padding
  waste. Tail bytes (< 16) are gathered into a zero-padded (N, 16)
  array; reading that as two little-endian uint64 words is equivalent
  to the canonical byte-by-byte tail switch because missing bytes
  contribute zero. All arithmetic is np.uint64 with wrapping
  semantics, matching C unsigned overflow.
"""

from __future__ import annotations

import numpy as np

# dablooms SALT_CONSTANT (src/dablooms.c:≈20)
DABLOOMS_SEED = 0x97C29B3A

_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)
_M = np.uint64(0xFFFFFFFFFFFFFFFF)  # 64-bit mask for scalar path

_AR16 = np.arange(16, dtype=np.int64)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    return (x << r_) | (x >> np.uint64(64 - r))


def _fmix(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> np.uint64(33))
    return k


def _as_byte_buffer(keys) -> tuple[np.ndarray, np.ndarray]:
    """(concatenated uint8 buffer, int64 lengths) for a batch of keys.

    Accepts a list/ndarray/pandas-Series of ``bytes`` or ``str``
    (str is UTF-8 encoded — the engine's byte-identical-text rule).
    """
    n = len(keys)
    lengths = np.empty(n, dtype=np.int64)
    parts = []
    for i, k in enumerate(keys):
        if isinstance(k, str):
            k = k.encode("utf-8")
        elif not isinstance(k, (bytes, bytearray, memoryview)):
            k = bytes(k)
        lengths[i] = len(k)
        parts.append(k)
    buf = np.frombuffer(b"".join(parts), dtype=np.uint8) if parts else np.empty(0, np.uint8)
    return buf, lengths


def murmur3_x64_128(keys, seed: int = DABLOOMS_SEED) -> tuple[np.ndarray, np.ndarray]:
    """Batch MurmurHash3_x64_128 over a list/array of bytes or str.

    Returns (out1, out2): the two uint64 words of each 128-bit hash,
    matching the canonical C output layout ((uint64_t*)out)[0|1].
    """
    buf, lengths = _as_byte_buffer(keys)
    n = len(lengths)
    if n == 0:
        e = np.empty(0, np.uint64)
        return e, e
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    return murmur3_x64_128_buffer(buf, offsets, lengths, seed)


#: Padded-matrix ceiling: above this many bytes (n rows x the longest
#: row, 16-byte aligned) the one-shot padded layout would blow memory
#: under length skew (one 1 GB document in a 20k-row batch), so those
#: batches take the per-block gather path whose work tracks TOTAL
#: bytes, not n x max.
_PAD_MATRIX_MAX_BYTES = 256 << 20


def murmur3_x64_128_buffer(
    buf: np.ndarray,
    offsets: np.ndarray,
    lengths: np.ndarray,
    seed: int = DABLOOMS_SEED,
) -> tuple[np.ndarray, np.ndarray]:
    """Batch MurmurHash3_x64_128 over a flat uint8 buffer with per-row
    (offset, length) views — the zero-copy Arrow hot path: a pyarrow
    string/binary column is exactly this layout, so the Spark-side
    kernels never materialize per-row Python objects.

    Layout strategy (profiled on the bench keys, guide §4.2 "hand
    whole batches to vectorized native code"): the rows are first
    scattered ONCE into a zero-padded (n, ceil(max_len/16)*16) uint8
    matrix — after that every 16-byte block round and the tail are
    contiguous column slices, where the old code paid a fancy
    16-byte-index gather (plus index-matrix allocation) per block
    round and a masked double-gather for the tail. Fixed-length
    contiguous batches (Arrow guarantees back-to-back rows) skip even
    that scatter: one reshape + one memcpy. Severely length-skewed
    batches where n x max_len explodes fall back to the per-block
    gather path (work proportional to total bytes).
    """
    n = len(lengths)
    if n == 0:
        e = np.empty(0, np.uint64)
        return e, e

    max_len = int(lengths.max())
    pad16 = (max_len + 15) & ~15
    if pad16 == 0:
        pad16 = 16
    if n * pad16 > _PAD_MATRIX_MAX_BYTES:
        return _murmur3_buffer_gather(buf, offsets, lengths, seed)

    with np.errstate(over="ignore"):
        lengths = np.asarray(lengths, dtype=np.int64)
        offsets = np.asarray(offsets, dtype=np.int64)
        nblocks = lengths >> 4
        max_blocks = int(nblocks.max())
        if max_blocks == 0 or int(nblocks.min()) == max_blocks:
            # every row has the same block count: rounds touch all rows,
            # no reorder needed
            order = None
            off_s, lens_s = offsets, lengths
        else:
            # Descending block-count order: rows needing block j form a
            # prefix, so each round is a contiguous head slice.
            order = np.argsort(-nblocks, kind="stable")
            off_s, lens_s = offsets[order], lengths[order]
        nb_s = lens_s >> 4

        # --- one-shot padded layout -----------------------------------
        if (
            order is None
            and int(lengths.min()) == max_len
            and n * max_len == int(lengths.sum())
            and (n == 1 or bool((np.diff(offsets) == max_len).all()))
        ):
            # fixed-length contiguous rows: reshape + one memcpy
            block = buf[int(offsets[0]): int(offsets[0]) + n * max_len]
            if max_len == pad16:
                padded = np.ascontiguousarray(block).reshape(n, pad16)
            else:
                padded = np.zeros((n, pad16), dtype=np.uint8)
                padded[:, :max_len] = block.reshape(n, max_len)
        else:
            padded = np.zeros((n, pad16), dtype=np.uint8)
            total = int(lens_s.sum())
            if total:
                row_of = np.repeat(
                    np.arange(n, dtype=np.int64) * pad16, lens_s
                )
                starts = np.zeros(n, dtype=np.int64)
                np.cumsum(lens_s[:-1], out=starts[1:])
                col_of = np.arange(total, dtype=np.int64) - np.repeat(
                    starts, lens_s
                )
                if order is None and bool(
                    np.array_equal(starts + off_s[0], off_s)
                ):
                    # rows are back-to-back in the buffer (the Arrow
                    # layout): skip the per-byte source gather
                    data = buf[int(off_s[0]): int(off_s[0]) + total]
                else:
                    data = buf[np.repeat(off_s, lens_s) + col_of]
                padded.reshape(-1)[row_of + col_of] = data
        words = padded.view("<u8")  # (n, pad16 // 8)

        h1 = np.full(n, np.uint64(seed))
        h2 = np.full(n, np.uint64(seed))

        if max_blocks:
            asc = nb_s[::-1]
            for j in range(max_blocks):
                cnt = n - int(np.searchsorted(asc, j, side="right"))
                if cnt == 0:
                    break
                k1 = words[:cnt, 2 * j].astype(np.uint64, copy=True)
                k2 = words[:cnt, 2 * j + 1].astype(np.uint64, copy=True)

                k1 *= _C1
                k1 = _rotl(k1, 31)
                k1 *= _C2
                h1[:cnt] ^= k1
                h1[:cnt] = _rotl(h1[:cnt], 27) + h2[:cnt]
                h1[:cnt] = h1[:cnt] * np.uint64(5) + np.uint64(0x52DCE729)

                k2 *= _C2
                k2 = _rotl(k2, 33)
                k2 *= _C1
                h2[:cnt] ^= k2
                h2[:cnt] = _rotl(h2[:cnt], 31) + h1[:cnt]
                h2[:cnt] = h2[:cnt] * np.uint64(5) + np.uint64(0x38495AB5)

        # Tail (len & 15 trailing bytes): the padded matrix is already
        # zero beyond each row's length, which matches the canonical
        # byte-switch (absent bytes contribute 0).
        has_tail = (lens_s & 15) > 0
        if bool(has_tail.any()):
            # tail-less rows have no tail word to read — and a row whose
            # length is exactly max blocks*16 would index past the last
            # column; clamp those to column 0 (value discarded by the
            # np.where below)
            wi = np.where(has_tail, nb_s << 1, 0).astype(np.int64)
            if max_blocks == 0:
                k1 = words[:, 0].astype(np.uint64, copy=True)
                k2 = words[:, 1].astype(np.uint64, copy=True)
            else:
                rows_i = np.arange(n, dtype=np.int64)
                k1 = words[rows_i, wi].astype(np.uint64, copy=True)
                k2 = words[rows_i, wi + 1].astype(np.uint64, copy=True)
            k2 *= _C2
            k2 = _rotl(k2, 33)
            k2 *= _C1
            h2 = h2 ^ np.where(has_tail, k2, np.uint64(0))
            k1 *= _C1
            k1 = _rotl(k1, 31)
            k1 *= _C2
            h1 = h1 ^ np.where(has_tail, k1, np.uint64(0))

        # Finalization
        ln_s = lens_s.astype(np.uint64)
        h1 ^= ln_s
        h2 ^= ln_s
        h1 += h2
        h2 += h1
        h1 = _fmix(h1)
        h2 = _fmix(h2)
        h1 += h2
        h2 += h1

    if order is None:
        return h1, h2
    out1 = np.empty(n, np.uint64)
    out2 = np.empty(n, np.uint64)
    out1[order] = h1
    out2[order] = h2
    return out1, out2


def _murmur3_buffer_gather(
    buf: np.ndarray,
    offsets: np.ndarray,
    lengths: np.ndarray,
    seed: int = DABLOOMS_SEED,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-block gather fallback for severely length-skewed batches:
    work tracks total bytes (each block round gathers only the rows
    that have that block), at the cost of a fancy 16-byte gather per
    round. Bit-identical to the padded path (property-tested)."""
    n = len(lengths)
    nblocks = lengths >> 4

    with np.errstate(over="ignore"):
        h1 = np.full(n, np.uint64(seed))
        h2 = np.full(n, np.uint64(seed))

        # Descending block-count order: rows needing block j form a prefix.
        order = np.argsort(-nblocks, kind="stable")
        nb_s = nblocks[order]
        off_s = offsets[order]
        h1_s = h1  # alias: we operate on sorted views then un-sort at the end
        h2_s = h2

        max_blocks = int(nb_s[0]) if n else 0
        # counts[j] = number of rows with nblocks > j (prefix length at block j)
        asc = nb_s[::-1]
        for j in range(max_blocks):
            cnt = n - int(np.searchsorted(asc, j, side="right"))
            if cnt == 0:
                break
            pos = off_s[:cnt] + (j << 4)
            g = buf[pos[:, None] + _AR16]  # (cnt, 16) contiguous
            kk = g.view("<u8")  # (cnt, 2) little-endian
            k1 = kk[:, 0].astype(np.uint64, copy=True)
            k2 = kk[:, 1].astype(np.uint64, copy=True)

            k1 *= _C1
            k1 = _rotl(k1, 31)
            k1 *= _C2
            h1_s[:cnt] ^= k1
            h1_s[:cnt] = _rotl(h1_s[:cnt], 27) + h2_s[:cnt]
            h1_s[:cnt] = h1_s[:cnt] * np.uint64(5) + np.uint64(0x52DCE729)

            k2 *= _C2
            k2 = _rotl(k2, 33)
            k2 *= _C1
            h2_s[:cnt] ^= k2
            h2_s[:cnt] = _rotl(h2_s[:cnt], 31) + h1_s[:cnt]
            h2_s[:cnt] = h2_s[:cnt] * np.uint64(5) + np.uint64(0x38495AB5)

        # Tail (len & 15 trailing bytes), zero-padded to 16 — equivalent
        # to the canonical byte-by-byte tail switch because missing
        # bytes contribute zero.
        tail_len_s = (lengths[order] & 15).astype(np.int64)
        tails = np.zeros((n, 16), dtype=np.uint8)
        has_tail = tail_len_s > 0
        if np.any(has_tail):
            cols = _AR16[None, :]
            mask = cols < tail_len_s[:, None]
            src = (off_s + (nb_s << 4))[:, None] + cols
            tails[mask] = buf[src[mask]]
        tk = tails.view("<u8")
        k1 = tk[:, 0].astype(np.uint64, copy=True)
        k2 = tk[:, 1].astype(np.uint64, copy=True)
        k2 *= _C2
        k2 = _rotl(k2, 33)
        k2 *= _C1
        h2_s = h2_s ^ np.where(has_tail, k2, np.uint64(0))
        k1 *= _C1
        k1 = _rotl(k1, 31)
        k1 *= _C2
        h1_s = h1_s ^ np.where(has_tail, k1, np.uint64(0))

        # Finalization
        ln_s = lengths[order].astype(np.uint64)
        h1_s ^= ln_s
        h2_s ^= ln_s
        h1_s += h2_s
        h2_s += h1_s
        h1_s = _fmix(h1_s)
        h2_s = _fmix(h2_s)
        h1_s += h2_s
        h2_s += h1_s

    out1 = np.empty(n, np.uint64)
    out2 = np.empty(n, np.uint64)
    out1[order] = h1_s
    out2[order] = h2_s
    return out1, out2


def murmur3_x64_128_scalar(key: bytes, seed: int = DABLOOMS_SEED) -> tuple[int, int]:
    """Pure-Python canonical transcription — the test oracle."""
    if isinstance(key, str):
        key = key.encode("utf-8")
    m = 0xFFFFFFFFFFFFFFFF
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    h1 = seed & m
    h2 = seed & m
    length = len(key)
    nblocks = length // 16

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & m

    def fmix(k):
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & m
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & m
        k ^= k >> 33
        return k

    for b in range(nblocks):
        k1 = int.from_bytes(key[b * 16 : b * 16 + 8], "little")
        k2 = int.from_bytes(key[b * 16 + 8 : b * 16 + 16], "little")
        k1 = (k1 * c1) & m
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & m
        h1 ^= k1
        h1 = rotl(h1, 27)
        h1 = (h1 + h2) & m
        h1 = (h1 * 5 + 0x52DCE729) & m
        k2 = (k2 * c2) & m
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & m
        h2 ^= k2
        h2 = rotl(h2, 31)
        h2 = (h2 + h1) & m
        h2 = (h2 * 5 + 0x38495AB5) & m

    tail = key[nblocks * 16 :]
    if tail:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k2 = int.from_bytes(tail[8:16].ljust(8, b"\0"), "little")
        k2 = (k2 * c2) & m
        k2 = rotl(k2, 33)
        k2 = (k2 * c1) & m
        h2 ^= k2
        k1 = (k1 * c1) & m
        k1 = rotl(k1, 31)
        k1 = (k1 * c2) & m
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & m
    h2 = (h2 + h1) & m
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & m
    h2 = (h2 + h1) & m
    return h1, h2


def dablooms_hash_words(keys, seed: int = DABLOOMS_SEED) -> tuple[np.ndarray, np.ndarray]:
    """The reference's (h1, h2) uint32 pair per key.

    Public dablooms `hash_func` (src/dablooms.c:≈182) computes a
    uint32 checksum[4] from the 128-bit hash and uses checksum[0] and
    checksum[1] — on little-endian, the low and high 32-bit halves of
    the first uint64 output word.
    """
    out1, _ = murmur3_x64_128(keys, seed)
    return _split_words(out1)


def dablooms_hash_words_buffer(
    buf: np.ndarray,
    offsets: np.ndarray,
    lengths: np.ndarray,
    seed: int = DABLOOMS_SEED,
) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy-buffer variant of :func:`dablooms_hash_words`."""
    out1, _ = murmur3_x64_128_buffer(buf, offsets, lengths, seed)
    return _split_words(out1)


def _split_words(out1: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h1 = out1.astype(np.uint32)  # low 32 bits
    h2 = (out1 >> np.uint64(32)).astype(np.uint32)  # high 32 bits
    return h1, h2
