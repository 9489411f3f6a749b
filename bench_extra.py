"""Per-phase isolation bench (guide §1.4) — NOT the driver's metric.

Breaks each headline query of bench.py into its internal phases and
times them separately (min over BENCH_EXTRA_TRIALS suite-interleaved
passes, same protocol as bench.py), so optimization work targets the
phase that actually costs. Results are printed as one JSON line.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python bench_extra.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bench import make_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from dablooms_spark.operators import (
        bloom_probe_column,
        bloom_semi_join,
        build_counting_bloom,
        build_scaling_bloom,
    )
    from dablooms_spark.operators.dedup import minhash_lsh_dedup
    from dablooms_spark.operators.sketch_agg import (
        approx_distinct_by,
        quantiles_by,
        sketch_agg,
    )
    from dablooms_spark.operators.similarity import brute_force_topk
    from dablooms_spark.sources import load_table, synth_webpages, table_row_count

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    emb = load_table(spark, sf_dir, "embeddings")

    state: dict = {}

    def p_bloom_build():
        keyed = lineitem.select(
            F.concat_ws(":", "l_orderkey", "l_linenumber").alias("k")
        )
        n = table_row_count(sf_dir, "lineitem") or lineitem.count()
        build_counting_bloom(keyed, "k", capacity=n, error_rate=0.01)

    def p_scaling_build():
        wp = synth_webpages(spark, n_rows=200_000, partitions=cpus * 2)
        state["sc_filt"] = build_scaling_bloom(
            wp, "url", "row_id", capacity=50_000, error_rate=0.01,
            id_layout="dense",
            expected_layers=(200_000 - 1) // (50_000 - 1) + 1,
        )

    def p_scaling_probe():
        wp = synth_webpages(spark, n_rows=200_000, partitions=cpus * 2)
        bloom_probe_column(wp.select("url"), "url", state["sc_filt"]).filter(
            "NOT is_member"
        ).count()

    def p_semi_build():
        dim = customer.filter(F.col("c_acctbal") > 0).select(
            F.col("c_custkey").cast("string").alias("ckey")
        )
        state["semi_filt"] = build_counting_bloom(
            dim, "ckey", capacity=20_000, error_rate=0.01
        )

    def p_semi_probe():
        dim = customer.filter(F.col("c_acctbal") > 0).select(
            F.col("c_custkey").cast("string").alias("ckey")
        )
        probe = orders.withColumn("okey", F.col("o_custkey").cast("string"))
        bloom_semi_join(
            probe, "okey", state["semi_filt"], exact_df=dim, exact_key="ckey"
        ).count()

    def p_sk_hll():
        approx_distinct_by(events, "event_type", "user_id", p=14).count()

    def p_sk_cms():
        sketch_agg(events, "event_type", "cms", eps=1e-4, delta=0.01)

    def p_sk_tdigest():
        quantiles_by(
            events, "event_type", "value", [0.5, 0.95, 0.99], kind="tdigest"
        ).count()

    def p_sk_kll():
        quantiles_by(events, "event_type", "value", [0.5], kind="kll", k=200).count()

    def p_minhash():
        wp = synth_webpages(spark, n_rows=20_000, partitions=cpus * 2)
        minhash_lsh_dedup(
            wp.select(F.col("row_id").alias("doc_id"), "text"), threshold=0.5
        ).count()

    def p_ann():
        queries_df = emb.filter(F.col("vec_id") < 50)
        brute_force_topk(emb, queries_df, k=10).count()

    def p_shsc_build():
        from dablooms_spark.operators.sharded_scaling import (
            build_sharded_scaling_layers,
        )

        rich = orders.filter(F.col("o_totalprice") > 150000).select(
            F.col("o_orderkey").cast("string").alias("okey"),
            F.col("o_orderkey").alias("oid"),
        )
        layers = build_sharded_scaling_layers(
            rich, "okey", "oid", capacity=20_000, error_rate=0.01, num_shards=8
        )
        state["shsc_layers"] = layers.persist()
        state["shsc_layers"].count()

    def p_shsc_probe():
        from dablooms_spark.operators.sharded_scaling import (
            sharded_scaling_semi_join,
        )

        rich = orders.filter(F.col("o_totalprice") > 150000).select(
            F.col("o_orderkey").cast("string").alias("okey"),
            F.col("o_orderkey").alias("oid"),
        )
        probe = lineitem.withColumn("lkey", F.col("l_orderkey").cast("string"))
        sharded_scaling_semi_join(
            probe, "lkey", state["shsc_layers"], num_shards=8
        ).count()

    phases = {
        "bloom_build_lineitem.total": p_bloom_build,
        "scaling_bloom.build": p_scaling_build,
        "scaling_bloom.probe": p_scaling_probe,
        "bloom_semi_join.build": p_semi_build,
        "bloom_semi_join.probe_join": p_semi_probe,
        "sketch.hll_distinct": p_sk_hll,
        "sketch.cms": p_sk_cms,
        "sketch.tdigest": p_sk_tdigest,
        "sketch.kll": p_sk_kll,
        "minhash_dedup.total": p_minhash,
        "ann_topk.total": p_ann,
        "sharded_scaling.build": p_shsc_build,
        "sharded_scaling.probe_join": p_shsc_probe,
    }

    # warm (same as bench.py)
    warm = spark.range(0, cpus * 200, 1, cpus * 2).select(
        F.col("id").cast("string").alias("k")
    )
    build_counting_bloom(warm, "k", capacity=100, error_rate=0.05)
    lineitem.limit(10_000).count()

    trials = int(os.environ.get("BENCH_EXTRA_TRIALS", "3"))
    times = {name: float("inf") for name in phases}
    for _ in range(trials):
        for name, fn in phases.items():
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            times[name] = min(times[name], time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        if "shsc_layers" in state:
            state.pop("shsc_layers").unpersist()
    out = {name: round(t, 3) for name, t in times.items()}
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
