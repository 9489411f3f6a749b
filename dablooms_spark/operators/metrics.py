"""Filter-quality observability: observed false-positive rate vs the
configured bound.

The reference's own acceptance test (test_dablooms.c chk_results:
probe a disjoint key set, count hits, require observed ≤ configured ε)
is a one-shot C loop; at cluster scale the same question is a
DataFrame aggregation over a membership probe. This module makes it a
first-class operator so pipelines can assert filter health in-line
(e.g. after an incremental ingest or a remove wave) and the bench can
report the north-rule metric "observed false-positive rate vs
configured bound" next to throughput.

No false negatives is the hard guarantee and is asserted elsewhere
(probe of the inserted set); FP rate is statistical — observed ≤ ε is
the expectation, with sampling noise ~sqrt(ε/n), which is why the
report carries the probe count alongside the rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dablooms_spark.functions.murmur import DABLOOMS_SEED


def observed_fp_rate(
    negatives: DataFrame,
    key_col: str,
    bloom,
    bound: float | None = None,
    seed: int = DABLOOMS_SEED,
) -> DataFrame:
    """One-row DataFrame(probes, false_positives, fp_rate,
    configured_bound, within_bound) from probing keys KNOWN to be
    absent from the filter (the caller's contract — any present key
    inflates the 'observed FP' count by construction).

    `bloom` is anything bloom_probe_column accepts (CountingBloom /
    ScalingBloom / broadcast blob). `bound` defaults to the filter's
    configured error rate. The probe is the same broadcast vectorized
    path production queries use; the aggregation is a map-side
    partial count — one scan, no shuffle of rows.
    """
    from dablooms_spark.operators.bloom_probe import bloom_probe_column

    if bound is None:
        geom = getattr(bloom, "geometry", None)
        bound = (
            float(geom.error_rate)
            if geom is not None
            else float(getattr(bloom, "error_rate"))
        )
    probed = bloom_probe_column(
        negatives.select(F.col(key_col)), key_col, bloom, seed=seed
    )
    return (
        probed.agg(
            F.count("*").alias("probes"),
            F.sum(F.col("is_member").cast("long")).alias("false_positives"),
        )
        .select(
            "probes",
            "false_positives",
            F.round(F.col("false_positives") / F.col("probes"), 6).alias(
                "fp_rate"
            ),
            F.lit(float(bound)).alias("configured_bound"),
            (
                F.col("false_positives") / F.col("probes")
                <= F.lit(float(bound))
            ).alias("within_bound"),
        )
    )


def observed_fp_rate_sharded(
    negatives: DataFrame,
    key_col: str,
    layers_df: DataFrame,
    num_shards: int | None = None,
    bound: float | None = None,
    seed: int = DABLOOMS_SEED,
) -> DataFrame:
    """observed_fp_rate for a sharded SCALING filter kept as layer
    rows (bigger-than-broadcast sizes): same one-row report, probed
    through the cogroup path. `bound` and `num_shards` default to the
    artifact's stamped sb_eps / num_shards (one head-row read)."""
    from dablooms_spark.operators.sharded_scaling import sharded_scaling_probe

    if bound is None or num_shards is None:
        cols = ["sb_eps"] + (
            ["num_shards"] if "num_shards" in layers_df.columns else []
        )
        head = layers_df.select(*cols).first()
        if bound is None:
            bound = float(head["sb_eps"]) if head is not None else 0.0
        if num_shards is None:
            if head is None or "num_shards" not in cols:
                raise ValueError(
                    "num_shards not stamped in the artifact; pass it"
                )
            num_shards = int(head["num_shards"])
    probed = sharded_scaling_probe(
        negatives.select(F.col(key_col)), key_col, layers_df,
        num_shards=num_shards, seed=seed,
    )
    return (
        probed.agg(
            F.count("*").alias("probes"),
            F.sum(F.col("is_member").cast("long")).alias("false_positives"),
        )
        .select(
            "probes",
            "false_positives",
            F.round(F.col("false_positives") / F.col("probes"), 6).alias(
                "fp_rate"
            ),
            F.lit(float(bound)).alias("configured_bound"),
            (
                F.col("false_positives") / F.col("probes")
                <= F.lit(float(bound))
            ).alias("within_bound"),
        )
    )
