"""Skew handling — explicit salted repartitioning (north_rule).

Web corpora are Zipf-skewed by host: the top host can carry 15–20% of
all rows (FIXTURES.md §1), so any shuffle keyed by host alone sends
that host's entire volume to one task. The salted pattern splits a hot
key across S subkeys; downstream sketch merges absorb the de-salting
for free because every sketch here merges associatively (counter-sum /
register-max / layer-concat).

Note the engine's own build paths avoid the problem structurally —
stage-1 partials are per input partition (map-side combine), so no
row shuffle is keyed by a skewed value. These helpers are for the
operations that DO shuffle rows by key: grouped exact aggregations,
per-host sketch tables materialized as DataFrames, LSH band joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key_col: str, salt_buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic per-row salt in [0, salt_buckets): derived from
    xxhash64 of the whole row's natural identity is unnecessary — a
    cheap monotonically-varying expression suffices; we use
    xxhash64(key, spark_partition_id, monotonically_increasing_id)."""
    return df.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(F.col(key_col), F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(salt_buckets),
        ),
    )


def salted_repartition(
    df: DataFrame, key_col: str, num_partitions: int, salt_buckets: int = 16
) -> DataFrame:
    """Repartition by (key, salt) so one hot key spreads over up to
    `salt_buckets` tasks. Use before a per-key sketch build whose
    merge de-salts (two-level aggregation)."""
    salted = with_salt(df, key_col, salt_buckets)
    return salted.repartition(num_partitions, F.col(key_col), F.col("__salt")).drop(
        "__salt"
    )


def salted_group_counts(
    df: DataFrame, key_col: str, salt_buckets: int = 16
) -> DataFrame:
    """Skew-safe exact counts: two-level aggregation — partial count
    per (key, salt) spreads the hot key, final sum de-salts. Equivalent
    result to groupBy(key).count() with a balanced first shuffle."""
    salted = with_salt(df, key_col, salt_buckets)
    partial = salted.groupBy(key_col, "__salt").agg(F.count("*").alias("c"))
    return partial.groupBy(key_col).agg(F.sum("c").alias("cnt"))
