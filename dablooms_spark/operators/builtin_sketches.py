"""JVM Datasketches builtins behind the engine's sketch API.

Spark 4.x ships Apache DataSketches aggregates (HLL, KLL, theta,
count-min) as Catalyst expressions — partial+final aggregation,
whole-stage codegen, zero Python workers. SURVEY.md §2.3: the engine
wraps these behind the same call shapes as the from-scratch numpy
sketches, so users choose per workload:

- builtins: fastest path, JVM-side, grouped aggregation for free;
- numpy sketches: needed when estimates must reproduce the engine's
  own hash/merge semantics (dablooms parity), when blobs must merge
  with stream/batch filters, or off-Spark.

Both are exposed; tests cross-check their estimates agree within
error bounds on the same data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_distinct_by(
    df: DataFrame, group_col: str, key_col: str, lg_k: int = 14
) -> DataFrame:
    """Grouped distinct-count estimate via hll_sketch_agg — the
    JVM analogue of sketch_agg.approx_distinct_by."""
    return (
        df.groupBy(F.col(group_col).cast("string").alias(group_col))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col(key_col).cast("string"), F.lit(lg_k))
            )
            .cast("long")
            .alias("approx_distinct")
        )
    )


def hll_sketch_column(df: DataFrame, group_col: str, key_col: str, lg_k: int = 14) -> DataFrame:
    """Grouped HLL sketch blobs (binary) — mergeable downstream with
    hll_union_agg, e.g. rolling daily sketches into monthly ones."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(key_col).cast("string"), F.lit(lg_k)).alias("hll_blob")
    )


def hll_union(df: DataFrame, blob_col: str = "hll_blob") -> DataFrame:
    """Union previously built HLL blobs (merge stage)."""
    return df.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(blob_col)))
        .cast("long")
        .alias("approx_distinct")
    )


def kll_quantiles_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float],
    k: int = 200,
) -> DataFrame:
    """Grouped KLL quantiles via kll_sketch_agg_double /
    kll_sketch_get_quantile_double — (group, q, value) rows, same
    shape as sketch_agg.quantiles_by."""
    qs = list(quantiles)
    sk = df.groupBy(F.col(group_col).cast("string").alias(group_col)).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias("kll")
    )
    est = sk.select(
        group_col,
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(q) for q in qs]).alias("q"),
                F.kll_sketch_get_quantile_double(
                    F.col("kll"), F.array(*[F.lit(q) for q in qs])
                ).alias("value"),
            )
        ).alias("z"),
    )
    return est.select(group_col, F.col("z.q").alias("q"), F.col("z.value").alias("value"))


def cms_sketch(df: DataFrame, key_col: str, eps: float = 1e-4,
               confidence: float = 0.99, seed: int = 42) -> bytes:
    """Whole-column count-min sketch blob via F.count_min_sketch
    (Spark's builtin CMS; binary is the DataSketches format, distinct
    from the engine's numpy CMS blob)."""
    row = df.agg(
        F.count_min_sketch(
            F.col(key_col).cast("string"), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms")
    ).first()
    return bytes(row.cms)


def theta_set_counts(
    df: DataFrame,
    key_col: str,
    cond_a,
    cond_b,
) -> DataFrame:
    """Set algebra at the sketch level: distinct keys satisfying A, B,
    A∩B and A\\B, computed from two theta sketches without a join —
    the sketch-native answer to INTERSECT/EXCEPT on distinct sets.
    Estimates are exact while distinct counts stay under the sketch's
    retention (~4k at default lgK), and within ~2% beyond it."""
    k = F.col(key_col).cast("string")
    sk = df.agg(
        F.theta_sketch_agg(F.when(cond_a, k)).alias("sa"),
        F.theta_sketch_agg(F.when(cond_b, k)).alias("sb"),
    )
    return sk.select(
        F.theta_sketch_estimate(F.col("sa")).cast("long").alias("in_a"),
        F.theta_sketch_estimate(F.col("sb")).cast("long").alias("in_b"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("sa"), F.col("sb"))
        ).cast("long").alias("in_both"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("sa"), F.col("sb"))
        ).cast("long").alias("a_only"),
    )


def theta_distinct(df: DataFrame, key_col: str) -> int:
    """Theta-sketch distinct estimate (supports set operations at the
    sketch level — the builtin complement to our HLL)."""
    row = df.agg(
        F.theta_sketch_estimate(
            F.theta_sketch_agg(F.col(key_col).cast("string"))
        ).alias("d")
    ).first()
    return int(row.d)
