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


def test_observed_fp_rate_per_layer(spark):
    """The north-star criterion is PER LAYER: every scaling layer's
    observed FP <= its own tightened eps_i. Fixture: dense-layout build
    over gapped ids (2*i), so each fixed id band carries ~50% of its
    capacity — the production regime (capacity = expected max load,
    not the knife edge). Deterministic given the pinned seed."""
    from dablooms_spark.operators import (
        build_scaling_bloom,
        observed_fp_rate,
        observed_fp_rate_per_layer,
    )

    n, cap = 6_000, 2_000
    df = spark.range(n).select(
        F.concat(F.lit("in"), F.col("id")).alias("k"),
        (F.col("id") * 2).alias("id"),
    )
    filt = build_scaling_bloom(
        df, "k", "id", capacity=cap, error_rate=0.05, id_layout="dense"
    )
    neg = spark.range(40_000).select(
        F.concat(F.lit("out"), F.col("id")).alias("k")
    )
    rows = observed_fp_rate_per_layer(neg, "k", filt).collect()
    assert len(rows) == len(filt.layers) == (2 * (n - 1)) // (cap - 1) + 1
    # the report's metadata mirrors the filter: loads, boundaries, eps
    assert sum(r["n"] for r in rows) == n
    assert [r["first_id"] for r in rows] == [l.first_id for l in filt.layers]
    eps = [r["layer_eps"] for r in rows]
    assert eps == sorted(eps, reverse=True)  # tightening schedule
    assert sum(eps) <= 0.05 + 1e-12
    for r in rows:
        assert r["probes"] == 40_000
        assert bool(r["within_bound"]) and r["fp_rate"] <= r["layer_eps"]
    # union-bound sanity vs the compound OR-probe report
    compound = observed_fp_rate(neg, "k", filt).first()
    assert compound["false_positives"] <= sum(
        r["false_positives"] for r in rows
    )
    # honesty: a layer's OWN keys probe as 100% hits through the
    # per-layer path (no false negatives, layer routing intact)
    l0 = filt.layers[0]
    own = df.filter(F.col("id") < l0.first_id + (cap - 1)).select("k")
    own_rows = observed_fp_rate_per_layer(own, "k", filt).collect()
    r0 = next(r for r in own_rows if r["layer"] == 0)
    assert r0["false_positives"] == r0["probes"] == l0.count
