"""Spark-side bloom operator tests: distributed build/probe end-to-end
on driver testdata + synthetic webpages (SURVEY.md §5.2.2/§5.2.3).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dablooms_spark.core import CountingBloom
from dablooms_spark.operators import (
    bloom_anti_join,
    bloom_probe_column,
    bloom_semi_join,
    build_counting_bloom,
    build_scaling_bloom,
)
from dablooms_spark.sources import load_table, synth_webpages


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_distributed_counting_build_matches_local(spark, docs):
    filt = build_counting_bloom(docs, "text", capacity=600, error_rate=0.05)
    texts = [r.text.encode() for r in docs.select("text").collect()]
    local = CountingBloom(600, 0.05)
    local.add(texts)
    assert filt.to_bytes() == local.to_bytes(), "distributed != single-node build"
    assert filt.count == len(texts)


def test_probe_column_no_false_negatives(spark, docs):
    filt = build_counting_bloom(docs, "text", capacity=600, error_rate=0.05)
    probed = bloom_probe_column(docs, "text", filt)
    assert probed.filter(~F.col("is_member")).count() == 0


def test_probe_fp_bounded(spark, docs):
    filt = build_counting_bloom(docs, "text", capacity=600, error_rate=0.01)
    absent = spark.range(5000).select(
        F.concat(F.lit("absent-"), F.col("id").cast("string")).alias("key")
    )
    hits = bloom_probe_column(absent, "key", filt).filter("is_member").count()
    assert hits / 5000 <= 0.02


def test_bloom_semi_join_exact(spark, sf_dir):
    """Runtime-filter pattern: bloom-pruned + exact-verified semi join
    must equal plain LEFT SEMI JOIN exactly."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    # filter: customers with acctbal > 0; probe orders against them
    dim = customer.filter("c_acctbal > 0").select(
        F.col("c_custkey").cast("string").alias("ckey")
    )
    filt = build_counting_bloom(dim, "ckey", capacity=1000, error_rate=0.01)
    probe = orders.withColumn("okey", F.col("o_custkey").cast("string"))
    got = bloom_semi_join(probe, "okey", filt, exact_df=dim, exact_key="ckey")
    expected = probe.join(dim, probe.okey == dim.ckey, "left_semi")
    assert got.count() == expected.count()
    assert got.select(F.sum("o_orderkey")).first()[0] == (
        expected.select(F.sum("o_orderkey")).first()[0]
    )


def test_bloom_anti_join_true_negatives(spark, docs):
    filt = build_counting_bloom(docs, "text", capacity=600, error_rate=0.05)
    mixed = docs.select(F.col("text").alias("key")).union(
        docs.sparkSession.range(500).select(
            F.concat(F.lit("new-key-"), F.col("id").cast("string")).alias("key")
        )
    )
    nonmembers = bloom_anti_join(mixed, "key", filt)
    # every reported non-member must genuinely be absent from the corpus
    overlap = nonmembers.join(
        docs.select(F.col("text").alias("key")), "key", "left_semi"
    ).count()
    assert overlap == 0


def test_scaling_build_on_events(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    filt = build_scaling_bloom(
        events.withColumn("key", F.concat_ws(":", "user_id", "event_type")),
        "key",
        "event_id",
        capacity=200,
        error_rate=0.05,
        num_shards=4,
    )
    assert filt.count == events.count()
    assert len(filt.layers) >= 2  # growth happened
    probed = bloom_probe_column(
        events.withColumn("key", F.concat_ws(":", "user_id", "event_type")),
        "key",
        filt,
    )
    assert probed.filter(~F.col("is_member")).count() == 0


def test_scaling_build_deterministic_across_shard_counts_fp(spark, sf_dir):
    """Different shard counts give different filters but both honor the
    compound FP bound and zero FN."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "key", F.col("event_id").cast("string")
    )
    absent = spark.range(4000).select(
        F.concat(F.lit("nope-"), F.col("id").cast("string")).alias("key")
    )
    for shards in (2, 8):
        filt = build_scaling_bloom(
            events, "key", "event_id", capacity=300, error_rate=0.05, num_shards=shards
        )
        fn = bloom_probe_column(events, "key", filt).filter("NOT is_member").count()
        assert fn == 0
        fp = bloom_probe_column(absent, "key", filt).filter("is_member").count()
        assert fp / 4000 <= 0.05 * 1.2


def test_synth_webpages_shape_and_skew(spark):
    wp = synth_webpages(spark, n_rows=20_000, partitions=8)
    assert wp.columns == ["url", "warc_ts", "html", "text", "lang", "row_id"]
    assert wp.count() == 20_000
    top = (
        wp.groupBy(F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"))
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    assert top["count"] > 20_000 * 0.05, "expected heavy host skew"
    # byte-identical text invariant: html embeds text exactly
    bad = wp.filter(
        F.decode("html", "utf-8") != F.concat(F.lit("<html><body>"), "text", F.lit("</body></html>"))
    ).count()
    assert bad == 0


def test_webpages_bloom_end_to_end(spark):
    wp = synth_webpages(spark, n_rows=30_000, partitions=8)
    filt = build_scaling_bloom(
        wp, "url", "row_id", capacity=5_000, error_rate=0.05, num_shards=8
    )
    assert len(filt.layers) >= 6
    fn = bloom_probe_column(wp, "url", filt).filter("NOT is_member").count()
    assert fn == 0
    absent = spark.range(10_000).select(
        F.concat(F.lit("https://unseen.example.com/"), F.col("id")).alias("url")
    )
    fp = bloom_probe_column(absent, "url", filt).filter("is_member").count()
    assert fp / 10_000 <= 0.05 * 1.2


def test_probe_pandas_fallback_matches_arrow(spark, docs, monkeypatch):
    """The pandas_udf fallback (pre-4.1 runtimes) must verdict
    identically to the arrow_udf hot path."""
    import dablooms_spark.operators.bloom_probe as bp

    filt = build_counting_bloom(docs, "text", capacity=600, error_rate=0.05)
    probe_df = docs.select("doc_id", "text").union(
        docs.sparkSession.range(300).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("absent-"), F.col("id")).alias("text"),
        )
    )
    arrow = {r.doc_id: r.is_member for r in bloom_probe_column(probe_df, "text", filt).collect()}
    monkeypatch.setattr(bp, "_arrow_udf", None)
    pandas_ = {r.doc_id: r.is_member for r in bp.bloom_probe_column(probe_df, "text", filt).collect()}
    assert arrow == pandas_


def test_auto_semi_join_strategies_exact_and_plan(spark, sf_dir):
    """auto_semi_join returns exactly LEFT SEMI under all three
    strategies, records its decision, and the physical plan matches:
    broadcast -> BroadcastHashJoin, shuffle -> shuffled join, bloom ->
    probe UDF + exact confirm (VERDICT round-1 item 8)."""
    from dablooms_spark.operators.bloom_probe import auto_semi_join

    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter("p_size >= 25")
    expected = {
        (r.l_orderkey, r.l_linenumber)
        for r in lineitem.join(
            part.select(F.col("p_partkey").alias("l_partkey")), "l_partkey", "left_semi"
        ).collect()
    }
    assert expected  # non-trivial fixture

    results = {}
    for strat in ("broadcast", "bloom", "sharded", "shuffle"):
        out = auto_semi_join(lineitem, part, "l_partkey", dim_key="p_partkey",
                             strategy=strat)
        assert out.auto_semi_strategy == strat
        results[strat] = {(r.l_orderkey, r.l_linenumber) for r in out.collect()}
        plan = out._jdf.queryExecution().executedPlan().toString()
        if strat == "broadcast":
            assert "BroadcastHashJoin" in plan
        elif strat == "bloom":
            assert "EvalPython" in plan or "ArrowEval" in plan  # probe UDF
            assert "LeftSemi" in plan  # exact confirm join
    for strat, got in results.items():
        assert got == expected, strat

    # auto decision: tiny dim -> broadcast
    out = auto_semi_join(lineitem, part, "l_partkey", dim_key="p_partkey")
    assert out.auto_semi_strategy == "broadcast"
    # broadcast disabled -> bloom (key universe prices a small filter)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = auto_semi_join(lineitem, part, "l_partkey", dim_key="p_partkey")
        assert out.auto_semi_strategy == "bloom"
        # key universe beyond the single-blob budget -> SHARDED filter
        # (the filter stays a DataFrame; never falls to plain shuffle
        # for hash-safe keys)
        out = auto_semi_join(lineitem, part, "l_partkey", dim_key="p_partkey",
                             bloom_blob_budget=1)
        assert out.auto_semi_strategy == "sharded"
        got = {(r.l_orderkey, r.l_linenumber) for r in out.collect()}
        assert got == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_sharded_bloom_build_probe_and_semi_join(spark, sf_dir):
    """Sharded filter (filter-as-DataFrame for sizes broadcast can't
    reach): no false negatives across shards, FP bounded, semi join
    with exact confirm matches LEFT SEMI; blobs-only build shuffle."""
    from dablooms_spark.operators.sharded import (
        build_sharded_counting_bloom,
        sharded_bloom_probe,
        sharded_semi_join,
    )

    orders = load_table(spark, sf_dir, "orders")
    dim = orders.filter("o_totalprice > 100000").select(
        F.col("o_custkey").cast("string").alias("ckey")
    )
    n_keys = dim.distinct().count()
    blobs = build_sharded_counting_bloom(
        dim, "ckey", capacity=max(n_keys * 2, 64), error_rate=0.01, num_shards=16
    ).persist()
    assert blobs.count() <= 16
    assert blobs.agg(F.sum("n")).first()[0] == dim.count()

    probe = orders.select(F.col("o_custkey").cast("string").alias("ckey")).distinct()
    probed = sharded_bloom_probe(probe, "ckey", blobs, num_shards=16, salt=4)
    got = {r.ckey: r.is_member for r in probed.collect()}
    members = {r.ckey for r in dim.distinct().collect()}
    # bloom invariant per shard: every true member must pass
    assert all(got[k] for k in members)
    non = [k for k in got if k not in members]
    fp = sum(got[k] for k in non) / max(len(non), 1)
    assert fp <= 0.05, f"sharded FP rate {fp}"

    expected = {
        r.o_orderkey
        for r in orders.filter(
            F.col("o_custkey").cast("string").isin(list(members))
        ).collect()
    }
    pr = orders.withColumn("ckey", F.col("o_custkey").cast("string"))
    out = sharded_semi_join(pr, "ckey", blobs, exact_df=dim, exact_key="ckey",
                            num_shards=16, salt=4)
    assert {r.o_orderkey for r in out.collect()} == expected
    blobs.unpersist()


def test_auto_anti_join_strategies_exact(spark, sf_dir):
    """auto_anti_join returns exactly LEFT ANTI under all three
    strategies."""
    from dablooms_spark.operators.bloom_probe import auto_anti_join

    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter("p_size >= 25")
    expected = {
        (r.l_orderkey, r.l_linenumber)
        for r in lineitem.join(
            part.select(F.col("p_partkey").alias("l_partkey")), "l_partkey", "left_anti"
        ).collect()
    }
    assert expected
    for strat in ("broadcast", "bloom", "shuffle"):
        out = auto_anti_join(lineitem, part, "l_partkey", dim_key="p_partkey",
                             strategy=strat)
        got = {(r.l_orderkey, r.l_linenumber) for r in out.collect()}
        assert got == expected, strat
    out = auto_anti_join(lineitem, part, "l_partkey", dim_key="p_partkey")
    assert out.auto_semi_strategy == "broadcast"


def test_auto_join_mixed_key_types_fall_back_and_raise(spark):
    """ADVICE r2 (medium): the bloom strategy hashes CAST(key AS STRING)
    on both sides — with probe/dim key types that render differently as
    strings but compare equal natively (double 25.0 vs int 25), the
    filter would false-negative and silently drop matching rows. Auto
    must fall back to an exact strategy; explicit 'bloom' must raise;
    both-integral keys canonicalize to long and stay bloom-eligible."""
    from dablooms_spark.operators.bloom_probe import auto_anti_join, auto_semi_join

    probe = spark.range(100).select((F.col("id") / F.lit(2)).alias("k"))  # double
    dim = spark.range(0, 50, 5).select(F.col("id").cast("int").alias("dk"))  # int
    expected_semi = {
        r.k for r in probe.join(
            dim.select(F.col("dk").cast("double").alias("k")), "k", "left_semi"
        ).collect()
    }
    assert expected_semi  # natively-equal double/int pairs exist

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = auto_semi_join(probe, dim, "k", dim_key="dk")
        assert out.auto_join_strategy == "shuffle"  # never bloom on unsafe types
        assert {r.k for r in out.collect()} == expected_semi
        out = auto_anti_join(probe, dim, "k", dim_key="dk")
        assert out.auto_join_strategy == "shuffle"
        assert {r.k for r in out.collect()} == {
            r.k for r in probe.collect()
        } - expected_semi
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    with pytest.raises(ValueError, match="bloom strategy is unsafe"):
        auto_semi_join(probe, dim, "k", dim_key="dk", strategy="bloom")

    # differing INTEGRAL types are safe: canonicalized to long on both sides
    probe_i = spark.range(100).select(F.col("id").cast("int").alias("k"))
    dim_l = spark.range(0, 50, 5).select(F.col("id").alias("dk"))  # long
    out = auto_semi_join(probe_i, dim_l, "k", dim_key="dk", strategy="bloom")
    assert {r.k for r in out.collect()} == set(range(0, 50, 5))
    out = auto_anti_join(probe_i, dim_l, "k", dim_key="dk", strategy="bloom")
    assert {r.k for r in out.collect()} == set(range(100)) - set(range(0, 50, 5))


def test_sharded_probe_null_keys_are_definite_negatives(spark):
    """ADVICE r2: NULL probe keys must not alias the literal string
    'None' (which a real key could be) — both probe paths agree."""
    from dablooms_spark.operators.sharded import (
        build_sharded_counting_bloom,
        sharded_bloom_probe,
    )

    dim = spark.createDataFrame(
        [("None",), ("alpha",), ("beta",)], "key string"
    )
    blobs = build_sharded_counting_bloom(
        dim, "key", capacity=64, error_rate=0.01, num_shards=4
    )
    probe = spark.createDataFrame(
        [(1, "None"), (2, None), (3, "alpha"), (4, "gamma")], "id int, key string"
    )
    got = {
        r.id: r.is_member
        for r in sharded_bloom_probe(probe, "key", blobs, num_shards=4, salt=2).collect()
    }
    assert got[1] is True  # the real 'None' string key
    assert got[2] is False  # NULL key: definite negative
    assert got[3] is True


def test_merge_blobs_df_underestimated_num_blobs_still_one_row(spark, docs):
    """ADVICE r2: num_blobs=1 underestimate must not skip the merge
    loop and leak a multi-row frame."""
    from dablooms_spark.operators.bloom_build import (
        counting_bloom_partials,
        merge_blobs_df,
    )

    partials = counting_bloom_partials(
        docs.repartition(6), "text", capacity=600, error_rate=0.05
    )
    merged = merge_blobs_df(partials, num_blobs=1).collect()
    assert len(merged) == 1
    filt = CountingBloom.from_bytes(bytes(merged[0].blob))
    assert filt.count == docs.count()


def test_scaling_layer_rows_checkpoint_equals_one_blob(spark, sf_dir, tmp_path):
    """The layer-row merge+checkpoint (parallel write, no single fat
    task) restores to a filter BIT-IDENTICAL to the one-blob
    merge_blobs_df path — the at-scale artifact shape."""
    from dablooms_spark.core.serde import loads
    from dablooms_spark.operators.bloom_build import (
        merge_blobs_df,
        restore_scaling_bloom_layers,
        scaling_bloom_partials,
        scaling_layers_df,
    )

    events = load_table(spark, sf_dir, "events").withColumn(
        "key", F.col("event_id").cast("string")
    )
    partials = scaling_bloom_partials(
        events, "key", "event_id", capacity=300, error_rate=0.05, num_shards=4
    ).persist()

    one = loads(bytes(merge_blobs_df(partials, num_blobs=4).first().blob))

    path = str(tmp_path / "layers")
    layers = scaling_layers_df(partials)
    layers.write.parquet(path)
    restored = restore_scaling_bloom_layers(spark, path)
    partials.unpersist()

    assert restored.to_bytes() == one.to_bytes()
    assert restored.count == one.count
    # the artifact is genuinely parallel: one row per layer, all disjoint
    import collections

    rows = spark.read.parquet(path).collect()
    keys = [(r.first_id, r.layer_eps) for r in rows]
    assert len(keys) == len(set(keys))
    assert len(rows) == len(one.layers)


def test_scaling_fixed_partials_no_shuffle_build(spark, tmp_path):
    """Fixed id-boundary scaling build (no row shuffle): unique integer
    ids in a width-(capacity-1) range can't exceed capacity-1 elements,
    so the per-layer bound and compound FP <= eps hold by construction;
    the layer set is a deterministic function of id, so the build is
    partition-order INVARIANT (bit-identical across repartitionings)."""
    from dablooms_spark.operators.bloom_build import (
        restore_scaling_bloom_layers,
        scaling_bloom_fixed_partials,
    )

    df = spark.range(16_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"), F.col("id")
    )
    path = str(tmp_path / "fixed_layers")
    scaling_bloom_fixed_partials(
        df.repartition(8), "key", "id", capacity=2_000, error_rate=0.05
    ).write.parquet(path)
    filt = restore_scaling_bloom_layers(spark, path)
    assert filt.count == 16_000
    assert filt.max_id == 15_999
    assert len(filt.layers) == 16_000 // 1_999 + 1
    # per-layer load bound: unique ids in width-1999 ranges
    assert all(l.count <= 1_999 for l in filt.layers)
    # no false negatives, ever
    keys = [f"k{i}".encode() for i in range(16_000)]
    assert filt.check(keys).all()
    # compound FP bounded by eps
    absent = [f"zz{i}".encode() for i in range(10_000)]
    assert filt.check(absent).mean() <= 0.05 * 1.2
    # partition-order invariance: a different partitioning gives
    # bit-identical layer blobs
    path2 = str(tmp_path / "fixed_layers2")
    scaling_bloom_fixed_partials(
        df.repartition(3), "key", "id", capacity=2_000, error_rate=0.05
    ).write.parquet(path2)
    a = {r.first_id: bytes(r.blob) for r in spark.read.parquet(path).collect()}
    b = {r.first_id: bytes(r.blob) for r in spark.read.parquet(path2).collect()}
    assert a == b
    # probe path compatibility
    from dablooms_spark.operators import bloom_probe_column

    probed = bloom_probe_column(df.select(F.col("key")), "key", filt)
    assert probed.filter("NOT is_member").count() == 0


def test_scaling_layers_df_colliding_layers_counter_sum(spark, sf_dir):
    """A resumed build over the SAME id range produces colliding
    (first_id, eps) layers; scaling_layers_df must counter-sum them
    (merge_layer_group's len>1 branch), equal to merging the blobs."""
    from dablooms_spark.core.serde import loads
    from dablooms_spark.operators.bloom_build import (
        merge_blobs_df,
        scaling_bloom_partials,
        scaling_layers_df,
    )

    events = load_table(spark, sf_dir, "events").withColumn(
        "key", F.col("event_id").cast("string")
    )
    partials = scaling_bloom_partials(
        events, "key", "event_id", capacity=300, error_rate=0.05, num_shards=4
    ).persist()
    doubled = partials.unionByName(partials)  # same layers twice
    rows = scaling_layers_df(doubled).collect()
    one = loads(bytes(merge_blobs_df(doubled, num_blobs=8).first().blob))
    partials.unpersist()
    assert sum(r.n for r in rows) == one.count
    by_key = {(r.first_id, r.layer_eps): bytes(r.blob) for r in rows}
    assert len(by_key) == len(rows)  # collisions merged, keys unique
    for layer in one.layers:
        got = by_key[(layer.first_id, layer.geometry.error_rate)]
        assert got == layer.to_bytes()


def test_distributed_remove_on_dense_built_filter(spark):
    """bloom_remove_distributed routes by the target's layer skeleton,
    so it must work identically on a fixed-boundary (dense) filter."""
    import copy

    from dablooms_spark.operators import build_scaling_bloom
    from dablooms_spark.operators.bloom_remove import (
        bloom_remove,
        bloom_remove_distributed,
    )

    df = spark.range(6000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"), F.col("id")
    )
    filt = build_scaling_bloom(
        df, "key", "id", capacity=1500, error_rate=0.05, id_layout="dense"
    )
    dels = df.filter("id % 4 = 0")
    driver = copy.deepcopy(filt)
    bloom_remove(driver, dels, "key", "id")
    dist = bloom_remove_distributed(filt, dels, "key", id_col="id")
    assert dist.to_bytes() == driver.to_bytes()
    kept = [f"k{i}".encode() for i in range(6000) if i % 4]
    assert dist.check(kept).all()


def test_strict_overflow_distributed_build(spark):
    """on_overflow='error' through the DISTRIBUTED build: duplicate-
    heavy keys that overflow a 4-bit counter must raise (reference
    bitmap_increment refusal, ≈L108) whether the overflow happens
    inside one partition or only in the cross-partition merge sum;
    clean builds succeed and stay strict through serde."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from dablooms_spark.core.counting_bloom import CountingBloom
    from dablooms_spark.operators.bloom_build import build_counting_bloom

    # clean: 200 distinct keys, no counter passes 15
    clean = spark.range(200).select(F.concat(F.lit("k"), F.col("id")).alias("k"))
    filt = build_counting_bloom(clean, "k", 500, 0.01, on_overflow="error")
    assert filt.on_overflow == "error"
    assert CountingBloom.from_bytes(filt.to_bytes()).on_overflow == "error"

    # within-partition overflow: one key 20x in a single partition
    hot1 = spark.range(20).select(F.lit("dup").alias("k")).coalesce(1)
    with _pytest.raises(Exception, match="overflow"):
        build_counting_bloom(hot1, "k", 500, 0.01, on_overflow="error")

    # cross-partition overflow: 8 copies in each of 4 partitions —
    # every partial stays at 8 (< 15), only the merge sum crosses
    hot2 = spark.range(32, numPartitions=4).select(F.lit("dup").alias("k"))
    with _pytest.raises(Exception, match="overflow"):
        build_counting_bloom(hot2, "k", 500, 0.01, on_overflow="error")

    # saturate mode shrugs at the same input
    ok = build_counting_bloom(hot2, "k", 500, 0.01)
    assert ok.check([b"dup"])[0]


def test_chunked_piece_flush_bit_identical(spark, monkeypatch):
    """Worker memory in the sparse-piece stages is bounded by
    PIECE_FLUSH_ELEMS regardless of input partition size. Chunking
    must be invisible: a coalesce(1) giant partition built with a tiny
    flush budget (many pieces per layer) is bit-identical to the
    default one-piece-per-partition build, for both the fixed-boundary
    scaling build and the distributed deletion blobs."""
    import copy

    import dablooms_spark.operators.bloom_build as bb
    from dablooms_spark.operators import build_scaling_bloom
    from dablooms_spark.operators.bloom_build import scaling_bloom_fixed_partials
    from dablooms_spark.operators.bloom_remove import bloom_remove_distributed

    df = spark.range(12_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"), F.col("id")
    )
    base = {
        (r.first_id,): (bytes(r.blob), r.n)
        for r in scaling_bloom_fixed_partials(
            df.coalesce(1), "key", "id", capacity=1500, error_rate=0.05
        ).collect()
    }
    # ~7 hash funcs x 12k rows >> 1024: forces many flushes in the one
    # giant partition
    monkeypatch.setattr(bb, "PIECE_FLUSH_ELEMS", 1024)
    chunked = {
        (r.first_id,): (bytes(r.blob), r.n)
        for r in scaling_bloom_fixed_partials(
            df.coalesce(1), "key", "id", capacity=1500, error_rate=0.05
        ).collect()
    }
    assert chunked == base

    # deletion path: chunked deletion blobs subtract identically
    filt = build_scaling_bloom(
        df, "key", "id", capacity=1500, error_rate=0.05, id_layout="dense"
    )
    monkeypatch.setattr(bb, "PIECE_FLUSH_ELEMS", 4 << 20)
    unchunked = bloom_remove_distributed(
        copy.deepcopy(filt), df.filter("id % 3 = 0").coalesce(1), "key", id_col="id"
    )
    monkeypatch.setattr(bb, "PIECE_FLUSH_ELEMS", 1024)
    chunked_rm = bloom_remove_distributed(
        copy.deepcopy(filt), df.filter("id % 3 = 0").coalesce(1), "key", id_col="id"
    )
    assert chunked_rm.to_bytes() == unchunked.to_bytes()


def test_approx_n_keys_slack_covers_undershoot(spark):
    """Filter pricing uses approx_count_distinct (map-side HLL
    partials — no distinct Exchange just for planning); the 1.1x+64
    slack must cover the 2% rsd so the filter is never undersized."""
    from dablooms_spark.operators.bloom_probe import _approx_n_keys

    df = spark.range(10_000).select(F.col("id").cast("string").alias("k"))
    n = _approx_n_keys(df, "k")
    assert 10_000 <= n <= int(10_000 * 1.25)


def test_fixed_partials_dense_piece_bit_identity(spark, tmp_path, monkeypatch):
    """The dense-piece drain encoding (banded bincount, empty-idx
    marker) is a pure transport optimization: sparse-only
    (dense_piece_frac=None, the pre-dense code path), the default
    mixed threshold, and all-dense (frac=0.0) must produce
    BIT-IDENTICAL layer artifacts — the artifact is invariant to both
    encoding and piece boundaries (min(15, Σ min(15, tᵢ)) ==
    min(15, Σ tᵢ)). A tiny flush threshold forces mid-stream drains,
    exercising the hold-back of the still-filling layer."""
    from dablooms_spark.operators import bloom_build as bb
    from dablooms_spark.operators.bloom_build import (
        scaling_bloom_fixed_partials,
    )

    df = spark.range(16_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"), F.col("id")
    )
    blobs = []
    # 20k elems ≈ many drains per partition at this size; the frac=0.7
    # variant drains mid-layer with hold-back active
    monkeypatch.setattr(bb, "PIECE_FLUSH_ELEMS", 20_000)
    for name, frac in [("sparse", None), ("mixed", 0.5), ("dense", 0.0),
                       ("holdback", 0.7)]:
        path = str(tmp_path / f"dpf_{name}")
        scaling_bloom_fixed_partials(
            df.repartition(5), "key", "id", capacity=2_000,
            error_rate=0.05, dense_piece_frac=frac,
        ).write.parquet(path)
        blobs.append(
            {r.first_id: bytes(r.blob)
             for r in spark.read.parquet(path).collect()}
        )
    assert blobs[0] == blobs[1] == blobs[2] == blobs[3]
    monkeypatch.setattr(bb, "PIECE_FLUSH_ELEMS", 4 << 20)
    # saturation parity: heavy duplicate keys clip counters at 15 the
    # same way through both encodings (per-piece clip, then sum+clip)
    dup = spark.range(4_000).select(
        (F.col("id") % 7).cast("string").alias("key"), F.col("id")
    )
    pair = []
    for name, frac in [("sat_sparse", None), ("sat_dense", 0.0)]:
        path = str(tmp_path / name)
        scaling_bloom_fixed_partials(
            dup.repartition(4), "key", "id", capacity=2_000,
            error_rate=0.05, dense_piece_frac=frac,
        ).write.parquet(path)
        pair.append(
            {r.first_id: bytes(r.blob)
             for r in spark.read.parquet(path).collect()}
        )
    assert pair[0] == pair[1]


def test_fixed_layer_eps_budget_and_savings():
    """The uniform eps schedule: Sigma <= eps for any hint (right,
    wrong, with overflow), and it genuinely shrinks geometry vs the
    polynomial at many-layer shapes."""
    from dablooms_spark.core.geometry import BloomGeometry
    from dablooms_spark.operators.bloom_build import fixed_layer_eps

    eps = 0.01
    # right hint, exact layer count
    for layers, hint in [(81, 81), (81, 40), (5, 5), (200, 81)]:
        total = sum(fixed_layer_eps(k, eps, hint) for k in range(layers))
        assert total <= eps + 1e-12, (layers, hint, total)
    # default polynomial also bounded
    assert sum(fixed_layer_eps(k, eps) for k in range(10_000)) <= eps + 1e-12
    # geometry savings at the bench shape (81 layers)
    poly = sum(
        BloomGeometry(200_000, fixed_layer_eps(k, eps)).size for k in range(81)
    )
    uni = sum(
        BloomGeometry(200_000, fixed_layer_eps(k, eps, 81)).size
        for k in range(81)
    )
    assert uni < poly * 0.85
    import pytest as _pt
    with _pt.raises(ValueError, match="expected_layers"):
        fixed_layer_eps(0, eps, 0)


def test_fixed_partials_uniform_schedule_membership(spark, tmp_path):
    """expected_layers build: no false negatives, FP within the full
    eps bound, layer rows carry the uniform eps, and the range path
    refuses the parameter."""
    import pytest as _pt

    from dablooms_spark.operators.bloom_build import (
        build_scaling_bloom,
        restore_scaling_bloom_layers,
        scaling_bloom_fixed_partials,
    )

    df = spark.range(16_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"), F.col("id")
    )
    L = 16_000 // 1_999 + 1
    path = str(tmp_path / "uniform_layers")
    scaling_bloom_fixed_partials(
        df.repartition(8), "key", "id", capacity=2_000, error_rate=0.05,
        expected_layers=L,
    ).write.parquet(path)
    rows = spark.read.parquet(path).collect()
    assert all(abs(r.layer_eps - 0.05 * 0.5 / L) < 1e-15 for r in rows)
    filt = restore_scaling_bloom_layers(spark, path)
    assert filt.count == 16_000
    keys = [f"k{i}".encode() for i in range(16_000)]
    assert filt.check(keys).all()
    absent = [f"zz{i}".encode() for i in range(10_000)]
    assert filt.check(absent).mean() <= 0.05 * 1.2
    # a WRONG (too small) hint still bounds compound FP: overflow
    # layers continue on the reserved eps/2 polynomial tail
    filt2 = build_scaling_bloom(
        df, "key", "id", capacity=2_000, error_rate=0.05,
        id_layout="dense", expected_layers=3,
    )
    assert filt2.check(keys).all()
    assert filt2.check(absent).mean() <= 0.05 * 1.2
    with _pt.raises(ValueError, match="id_layout='dense'"):
        build_scaling_bloom(
            df, "key", "id", capacity=2_000, error_rate=0.05,
            id_layout="range", expected_layers=L,
        )


def test_driver_merge_routing_bit_identical(spark):
    """Small inputs route the wide counting build and the dense scaling
    build through a driver-side piece fold (no merge exchange); the
    resulting filter must be bit-identical to the distributed merge
    (piece-boundary invariance: min(15, sum(min(15, t))) == min(15,
    sum(t)))."""
    import numpy as _np
    from pyspark.sql import functions as F

    from dablooms_spark.operators import build_counting_bloom, build_scaling_bloom

    df = spark.range(0, 30_000, 1, 5).select(
        F.concat_ws(":", F.col("id"), F.lit("x")).alias("key"),
        F.col("id").alias("id"),
    )
    # capacity chosen to cross the wide-filter (chunked) threshold
    drv = build_counting_bloom(df, "key", capacity=300_000, error_rate=0.01)
    spark.conf.set("spark.dablooms.build.driverMergeMaxBytes", "0")
    try:
        dist = build_counting_bloom(df, "key", capacity=300_000, error_rate=0.01)
    finally:
        spark.conf.unset("spark.dablooms.build.driverMergeMaxBytes")
    assert drv.count == dist.count == 30_000
    assert _np.array_equal(drv.counters, dist.counters)

    sdrv = build_scaling_bloom(
        df, "key", "id", capacity=8_000, error_rate=0.02,
        id_layout="dense", expected_layers=4,
    )
    spark.conf.set("spark.dablooms.build.driverMergeMaxBytes", "0")
    try:
        sdist = build_scaling_bloom(
            df, "key", "id", capacity=8_000, error_rate=0.02,
            id_layout="dense", expected_layers=4,
        )
    finally:
        spark.conf.unset("spark.dablooms.build.driverMergeMaxBytes")
    assert sdrv.to_bytes() == sdist.to_bytes()
