"""observed_fp_rate: the reference's chk_results protocol (probe a
disjoint key set, require observed FP ≤ configured ε) as a DataFrame
operator."""

from pyspark.sql import functions as F


def test_observed_fp_rate_counting(spark):
    from dablooms_spark.operators import build_counting_bloom, observed_fp_rate

    # capacity with ~10% headroom: the partitioned (banded) layout both
    # we and the reference use sits at ~1.02-1.06x eps when loaded to
    # EXACTLY 100% of capacity (1-(1-1/cpf)^cap per band, ceil-rounded)
    # — production sizes capacity as the expected max load, not the
    # knife edge
    pos = spark.range(0, 5_000).select(
        F.concat_ws(":", F.lit("in"), "id").alias("k")
    )
    filt = build_counting_bloom(pos, "k", capacity=5_500, error_rate=0.05)
    neg = spark.range(0, 20_000).select(
        F.concat_ws(":", F.lit("out"), "id").alias("k")
    )
    row = observed_fp_rate(neg, "k", filt).first()
    assert row["probes"] == 20_000
    assert row["configured_bound"] == 0.05
    # dablooms' own acceptance criterion: observed ≤ configured
    assert row["fp_rate"] <= 0.05 and bool(row["within_bound"])
    # sanity: the report is honest — probing the INSERTED set through
    # the same operator reads 100% hits (no false negatives)
    full = observed_fp_rate(pos, "k", filt, bound=1.0).first()
    assert full["false_positives"] == 5_000


def test_observed_fp_rate_sharded(spark):
    from dablooms_spark.operators import (
        build_sharded_scaling_layers,
        observed_fp_rate_sharded,
    )

    pos = spark.range(0, 8_000).select(
        F.concat_ws(":", F.lit("in"), "id").alias("k"), F.col("id")
    )
    layers = build_sharded_scaling_layers(
        pos, "k", "id", capacity=2_000, error_rate=0.05, num_shards=4
    )
    neg = spark.range(0, 20_000).select(
        F.concat_ws(":", F.lit("out"), "id").alias("k")
    )
    # num_shards and bound both read from the stamped artifact
    row = observed_fp_rate_sharded(neg, "k", layers).first()
    assert row["probes"] == 20_000
    assert row["configured_bound"] == 0.05
    assert row["fp_rate"] <= 0.05 and bool(row["within_bound"])


def test_observed_fp_rate_uniform_schedule(spark):
    """The uniform eps/(2L) schedule's compound FP bound holds
    empirically: a disjoint-key probe over a uniform-built scaling
    filter observes FP <= the configured bound (the chk_results
    protocol on the round-4 schedule)."""
    from dablooms_spark.operators import build_scaling_bloom, observed_fp_rate

    n = 20_000
    df = spark.range(n).select(
        F.concat(F.lit("in"), F.col("id")).alias("k"), F.col("id")
    )
    L = (n - 1) // (2_000 - 1) + 1
    filt = build_scaling_bloom(
        df, "k", "id", capacity=2_000, error_rate=0.02,
        id_layout="dense", expected_layers=L,
    )
    neg = spark.range(50_000).select(F.concat(F.lit("out"), F.col("id")).alias("k"))
    row = observed_fp_rate(neg, "k", filt).first()
    assert row.within_bound and row.fp_rate <= 0.02
