"""Hash-kernel parity tests (SURVEY.md §5.2.1).

The vectorized numpy MurmurHash3_x64_128 must agree byte-for-byte with
the canonical algorithm: we check it against (a) the SMHasher
verification protocol whose published constant for MurmurHash3_x64_128
is 0x6384BA69, and (b) a scalar pure-Python transcription, on
adversarial lengths (0, 1, 15, 16, 17, multi-block, long).
"""

import random

import numpy as np
import pytest

from dablooms_spark.functions.murmur import (
    DABLOOMS_SEED,
    murmur3_x64_128,
    murmur3_x64_128_scalar,
    dablooms_hash_words,
)
from dablooms_spark.functions.hashing import km_expand, km_indexes


def _hash_bytes(key: bytes, seed: int) -> bytes:
    o1, o2 = murmur3_x64_128([key], seed)
    return int(o1[0]).to_bytes(8, "little") + int(o2[0]).to_bytes(8, "little")


def test_smhasher_verification_constant():
    """SMHasher VerificationTest: hash keys {0},{0,1},...,{0..254} with
    seed 256-len, hash the concatenated digests with seed 0; the first
    4 little-endian bytes must be 0x6384BA69 (published constant for
    MurmurHash3_x64_128). Passing proves bit-exactness of the whole
    algorithm including tails and finalization."""
    digests = b""
    for i in range(256):
        key = bytes(range(i))
        digests += _hash_bytes(key, 256 - i)
    final = _hash_bytes(digests, 0)
    verification = int.from_bytes(final[:4], "little")
    assert verification == 0x6384BA69, hex(verification)


@pytest.mark.parametrize("seed", [0, 1, DABLOOMS_SEED, 0xFFFFFFFF])
def test_vectorized_matches_scalar(seed):
    rng = random.Random(42)
    keys = [b""]
    for ln in [1, 2, 7, 8, 9, 15, 16, 17, 31, 32, 33, 100, 1000, 4097]:
        keys.append(bytes(rng.randrange(256) for _ in range(ln)))
    o1, o2 = murmur3_x64_128(keys, seed)
    for i, k in enumerate(keys):
        s1, s2 = murmur3_x64_128_scalar(k, seed)
        assert (int(o1[i]), int(o2[i])) == (s1, s2), f"mismatch len={len(k)}"


def test_batch_random_fuzz():
    rng = random.Random(7)
    keys = [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 300)))
        for _ in range(500)
    ]
    o1, o2 = murmur3_x64_128(keys, DABLOOMS_SEED)
    sample = rng.sample(range(500), 50)
    for i in sample:
        s1, s2 = murmur3_x64_128_scalar(keys[i], DABLOOMS_SEED)
        assert (int(o1[i]), int(o2[i])) == (s1, s2)


def test_str_is_hashed_as_utf8():
    o1a, o2a = murmur3_x64_128(["héllo wörld"])
    o1b, o2b = murmur3_x64_128(["héllo wörld".encode("utf-8")])
    assert o1a[0] == o1b[0] and o2a[0] == o2b[0]


def test_dablooms_words_split():
    """checksum[0]/checksum[1] = low/high 32 bits of first u64 word."""
    keys = [b"abc", b"def" * 10]
    o1, _ = murmur3_x64_128(keys)
    h1, h2 = dablooms_hash_words(keys)
    for i in range(2):
        assert int(h1[i]) == int(o1[i]) & 0xFFFFFFFF
        assert int(h2[i]) == int(o1[i]) >> 32


def test_km_indexes_match_slow_oracle():
    """(h1 + i*h2) % cpf with uint32 wrap, band offset i*cpf."""
    keys = [b"alpha", b"beta", b"x" * 50]
    nfuncs, cpf = 7, 12347
    idx = km_indexes(keys, nfuncs, cpf)
    h1, h2 = dablooms_hash_words(keys)
    for r, k in enumerate(keys):
        for i in range(nfuncs):
            expect = ((int(h1[r]) + i * int(h2[r])) & 0xFFFFFFFF) % cpf + i * cpf
            assert idx[r, i] == expect
    assert idx.shape == (3, nfuncs)
    idx2 = km_expand(h1, h2, nfuncs, cpf)
    assert np.array_equal(idx, idx2)


def test_padded_layout_edge_cases_match_scalar():
    """The padded-matrix kernel (one-shot scatter + column slices) must
    be bit-identical to the canonical scalar transcription across its
    special cases: empty keys, tail-only rows, a max-length row that is
    an exact 16-multiple while other rows carry tails (the tail-word
    column-clamp path), and fixed-length contiguous batches."""
    from dablooms_spark.functions.murmur import murmur3_x64_128_scalar

    batches = [
        [b"", b"a", b"0123456789abcdef", b"0123456789abcde"],
        [b"x" * 32, b"y" * 17, b"z" * 3, b"w" * 16],      # 16-mult max + tails
        [b"fixedlen" * 3] * 5,                              # fixed-length path
        [bytes([i % 256]) * (i * 7 % 61) for i in range(200)],
    ]
    for keys in batches:
        o1, o2 = murmur3_x64_128(keys)
        for i, k in enumerate(keys):
            s1, s2 = murmur3_x64_128_scalar(k)
            assert int(o1[i]) == s1 and int(o2[i]) == s2, (keys, i)


def test_gather_fallback_matches_padded():
    """Severely length-skewed batches fall back to the per-block gather
    path; both paths must agree bit-for-bit."""
    import dablooms_spark.functions.murmur as M

    keys = [b"short", b"L" * 5000, b"", b"mid" * 7]
    p1, p2 = M.murmur3_x64_128(keys)
    saved = M._PAD_MATRIX_MAX_BYTES
    try:
        M._PAD_MATRIX_MAX_BYTES = 1
        g1, g2 = M.murmur3_x64_128(keys)
    finally:
        M._PAD_MATRIX_MAX_BYTES = saved
    assert np.array_equal(p1, g1) and np.array_equal(p2, g2)
