"""Deduplication operators for web-scale corpora.

Four strategies, each with the scaling shape that matters at 10^12
documents:

- exact_dedup: hash-groupBy on a text digest — one shuffle of
  (digest, id) pairs, never of text bytes.
- minhash_lsh_dedup: token-shingle MinHash signatures (numpy over
  Arrow batches), banded LSH bucketing, candidate self-join within
  buckets, exact Jaccard verification JVM-side (array_intersect /
  array_union on shingle sets). Only candidate pairs — a vanishing
  fraction of n² — ever join.
- simhash_dedup: 64-bit SimHash fingerprints (numpy bit-bucketed
  majority), banded 16-bit prefixes for candidates, exact Hamming
  verification via bit_count(f1 ^ f2) in Catalyst.
- ngram_jaccard_dedup: exact Jaccard on shingle sets for candidate
  pairs from any generator (the verification stage alone).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from dablooms_spark.operators.textops import shingle_hashes

_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical row per distinct text: (doc_id = min id, dupes = count).
    Shuffles only (md5, id); text stays put."""
    return (
        df.select(F.md5(F.col(text_col)).alias("__h"), F.col(id_col))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dupes"))
        .drop("__h")
    )


def _minhash_udf(num_perms: int, seed: int):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perms, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perms, dtype=np.int64).astype(np.uint64)

    @pandas_udf("array<long>")
    def minhash(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in it:
            out = []
            for sh in series:
                h = np.asarray(sh, dtype=np.uint64)
                if len(h) == 0:
                    out.append(np.zeros(num_perms, dtype=np.int64))
                    continue
                with np.errstate(over="ignore"):
                    m = (a[None, :] * h[:, None] + b[None, :]) % np.uint64(_MERSENNE)
                out.append(m.min(axis=0).astype(np.int64))
            yield pd.Series(out)

    return minhash


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perms: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id, shingles array<long>, sig array<long>)."""
    mh = _minhash_udf(num_perms, seed)
    return (
        df.select(F.col(id_col), shingle_hashes(text_col, k=k).alias("shingles"))
        .withColumn("sig", mh("shingles"))
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perms: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard) with exact-verified
    Jaccard >= threshold. LSH with b bands of r = num_perms/b rows has
    candidate-recall ≈ 1-(1-t^r)^b; 16 bands × 4 rows catches t=0.7
    pairs with p ≈ 0.97+."""
    assert num_perms % bands == 0
    r = num_perms // bands
    sigs = minhash_signatures(df, text_col, id_col, k, num_perms, seed).persist()

    band_rows = sigs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.concat_ws(
                    ",",
                    F.concat(bi.cast("string"), F.lit(":")),
                    F.concat_ws(",", F.slice(F.col("sig"), bi * r + 1, r)),
                ),
            )
        ).alias("band_key"),
    )
    left = band_rows.alias("l")
    right = band_rows.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sh = sigs.select(F.col(id_col), F.col("shingles"))
    verified = (
        candidates.join(
            sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    out = verified.persist()
    out.count()
    sigs.unpersist()
    return out


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash long): 64-bit SimHash over token xxhash64 values.
    Token hashing stays JVM-side; the bit-majority fold is numpy."""
    tok_hashes = F.transform(
        F.split(F.col(text_col), " "), lambda t: F.xxhash64(t)
    )

    @pandas_udf("long")
    def fold(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        bits = np.arange(64, dtype=np.uint64)
        for series in it:
            out = np.zeros(len(series), dtype=np.int64)
            for i, hs in enumerate(series):
                h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
                if len(h) == 0:
                    continue
                onebits = ((h[:, None] >> bits[None, :]) & np.uint64(1)).sum(axis=0)
                fp = np.uint64(0)
                maj = onebits * 2 > len(h)
                fp = np.sum(np.where(maj, np.uint64(1) << bits, np.uint64(0)), dtype=np.uint64)
                out[i] = np.int64(fp.astype(np.int64))
            yield pd.Series(out)

    return df.select(F.col(id_col), fold(tok_hashes).alias("simhash"))


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash: candidates share one of four
    16-bit bands (any pair within Hamming distance 3 must agree on at
    least one band — pigeonhole), verified exactly with
    bit_count(a ^ b) <= max_hamming in Catalyst."""
    fps = simhash_fingerprints(df, text_col, id_col).persist()
    bands = fps.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{i}:"),
                        F.shiftrightunsigned("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .cast("string"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("band_key"),
    )
    l, r = bands.alias("l"), bands.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    out = pairs.persist()
    out.count()
    fps.unpersist()
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Exact n-gram Jaccard for given (id_a, id_b) pairs — the
    verification stage reusable with any candidate generator."""
    sh = df.select(
        F.col(id_col), shingle_hashes(text_col, k=k).alias("shingles")
    )
    return (
        pairs.join(
            sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
    )
