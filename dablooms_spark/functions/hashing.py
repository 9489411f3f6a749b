"""Kirsch–Mitzenmacher index expansion and related hash utilities.

The reference expands one 128-bit hash into nfuncs banded counter
indices: index_i = (h1 + i*h2) mod counts_per_func, placed in band
i*counts_per_func (public dablooms `hash_func` src/dablooms.c:≈182,
`counting_bloom_add` ≈L202 — the filter is banded: hash function i
owns its own counts_per_func-wide slice).
"""

from __future__ import annotations

import numpy as np

from dablooms_spark.functions.murmur import DABLOOMS_SEED, dablooms_hash_words


def km_expand(
    h1: np.ndarray,
    h2: np.ndarray,
    nfuncs: int,
    counts_per_func: int,
) -> np.ndarray:
    """Expand precomputed (h1, h2) uint32 word pairs into flat banded
    counter indices, shape (n, nfuncs).

    index[:, i] = i*counts_per_func + (h1 + i*h2) % counts_per_func
    with uint32 wrapping arithmetic exactly as the reference's C code.
    Precomputing (h1, h2) once lets a multi-layer scaling filter hash
    each key a single time even though each layer's geometry differs.

    dtype: uint32 whenever the filter's counter space fits (size =
    nfuncs*counts_per_func <= 2^32-1 — every practical geometry),
    else int64. The piece stages concatenate/sort/unique these
    indices in bulk; 4-byte elements halve that stage's DRAM
    traffic, which is what caps multi-core scaling of the build.
    Values are identical either way (both branches compute the same
    integers); downstream consumers are dtype-agnostic numpy ops.
    """
    i = np.arange(nfuncs, dtype=np.uint32)
    with np.errstate(over="ignore"):
        mixed = h1[:, None] + i[None, :] * h2[:, None]  # uint32 wrap
    cpf = np.uint32(counts_per_func)
    size = int(nfuncs) * int(counts_per_func)
    if size <= 0xFFFFFFFF:
        idx = mixed % cpf
        idx += (i * cpf)[None, :]  # < size, so no uint32 wrap
        return idx
    idx = (mixed % cpf).astype(np.int64)
    idx += (i.astype(np.int64) * np.int64(counts_per_func))[None, :]
    return idx


def km_indexes(
    keys,
    nfuncs: int,
    counts_per_func: int,
    seed: int = DABLOOMS_SEED,
) -> np.ndarray:
    """Flat banded counter indices for raw keys (hash + expand)."""
    h1, h2 = dablooms_hash_words(keys, seed)
    return km_expand(h1, h2, nfuncs, counts_per_func)
