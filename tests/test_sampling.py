"""Deterministic splits and benchmark decontamination."""

from pyspark.sql import functions as F

from dablooms_spark.operators.sampling import (
    contamination_pairs,
    decontaminate,
    deterministic_split,
    split_bucket,
)

W = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_stable_and_proportional(spark):
    df = spark.range(20_000).select(F.col("id").cast("string").alias("key"))
    s = deterministic_split(df, "key", W)
    counts = {r["split"]: r["count"] for r in s.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.01
    # pure function of the key: identical under repartition
    a = {r["key"]: r["split"] for r in s.collect()}
    b = {
        r["key"]: r["split"]
        for r in deterministic_split(df.repartition(13), "key", W).collect()
    }
    assert a == b


def test_split_salt_rotates_wall(spark):
    df = spark.range(5_000).select(F.col("id").cast("string").alias("key"))
    a = {r["key"]: r["split"] for r in deterministic_split(df, "key", W).collect()}
    c = {
        r["key"]: r["split"]
        for r in deterministic_split(df, "key", W, salt="exp2").collect()
    }
    moved = sum(1 for k in a if a[k] != c[k])
    assert moved > 500  # a new salt re-deals a substantial fraction


def test_split_is_map_only(spark):
    df = spark.range(100).select(F.col("id").cast("string").alias("key"))
    plan = (
        deterministic_split(df, "key", W)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_split_bucket_percentage_sample(spark):
    df = spark.range(50_000).select(F.col("id").cast("string").alias("key"))
    n = df.filter(split_bucket("key") < 5).count()
    assert abs(n / 50_000 - 0.05) < 0.01


def test_split_zero_weight_tail_and_nulls(spark):
    """Regression: a cumulative fraction hitting 1.0 must not mint a
    14-hex cut (which would dump rows into a zero-weight final split);
    NULL keys get NULL splits, never a silent pile-up in one split."""
    df = spark.range(2_000).select(F.col("id").cast("string").alias("key"))
    s = deterministic_split(df, "key", {"a": 0.7, "b": 0.3, "c": 0.0})
    counts = {r["split"]: r["count"] for r in s.groupBy("split").count().collect()}
    assert counts.get("c", 0) == 0
    assert abs(counts["b"] / 2_000 - 0.3) < 0.05

    withnull = spark.createDataFrame([("k1",), (None,)], "key string")
    got = {
        r["key"]: r["split"]
        for r in deterministic_split(withnull, "key", W).collect()
    }
    assert got["k1"] in W
    assert got[None] is None
    buckets = {
        r["key"]: r["b"]
        for r in withnull.withColumn("b", split_bucket("key")).collect()
    }
    assert buckets[None] is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-negative"):
        deterministic_split(df, "key", {"a": 1.2, "b": -0.2})


def test_contamination_and_decontaminate(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "completely unrelated benchmark prompt about math"),
            # doc 10 copies doc 0's opening — contaminated
            (10, "the quick brown fox jumps over a sleeping cat instead"),
            (11, "novel training text with no overlap whatsoever here"),
        ],
        ["doc_id", "text"],
    )
    bench = docs.filter("doc_id < 10")
    corpus = docs.filter("doc_id >= 10")
    pairs = contamination_pairs(corpus, bench, min_hits=1).collect()
    assert {(r["doc_id"], r["bench_id"]) for r in pairs} == {(10, 0)}
    # shared shingles: positions 1..2 of the 5-gram window
    assert pairs[0]["n_shared"] == 2
    clean = decontaminate(corpus, bench, min_hits=1)
    assert {r["doc_id"] for r in clean.collect()} == {11}
    # raising min_hits above the overlap clears the flag
    assert contamination_pairs(corpus, bench, min_hits=3).count() == 0


def test_bloom_decontaminate_equals_exact(spark):
    """bloom_decontaminate == decontaminate on the same input: bloom
    misses are definite negatives, FPs are washed out by the exact
    confirm stage — only the cost topology differs."""
    from dablooms_spark.operators.sampling import bloom_decontaminate

    rows = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "completely unrelated benchmark prompt about math"),
        (10, "the quick brown fox jumps over a sleeping cat instead"),
        (11, "novel training text with no overlap whatsoever here"),
    ] + [(100 + i, f"filler document number {i} with distinct words only") for i in range(20)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = docs.filter("doc_id < 10")
    corpus = docs.filter("doc_id >= 10")

    exact = {r["doc_id"] for r in decontaminate(corpus, bench, min_hits=1).collect()}
    got = {
        r["doc_id"]
        for r in bloom_decontaminate(
            corpus, bench, min_hits=1, num_shards=4
        ).collect()
    }
    assert got == exact
    assert 10 not in got and 11 in got

    # a tiny fixed capacity forces a high-FP regime: the confirm stage
    # must still wash every false positive out
    got_fp = {
        r["doc_id"]
        for r in bloom_decontaminate(
            corpus, bench, min_hits=1, num_shards=4,
            capacity=8, error_rate=0.4,
        ).collect()
    }
    assert got_fp == exact

    # min_hits above the true overlap keeps everything
    all_ids = {r["doc_id"] for r in corpus.collect()}
    kept = {
        r["doc_id"]
        for r in bloom_decontaminate(
            corpus, bench, min_hits=3, num_shards=4
        ).collect()
    }
    assert kept == all_ids


def test_stratified_sample_exact_quota_and_stability(spark):
    from dablooms_spark.operators.sampling import stratified_sample

    rows = [(i, "a" if i < 40 else "b") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, grp string")
    got = stratified_sample(df, "grp", 10, "id")
    per = {r.grp: r.n for r in got.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    # hot stratum capped exactly; small stratum (10 rows) kept whole
    assert per == {"a": 10, "b": 10}
    # pure function of the data: identical sample on a reshuffled input
    again = stratified_sample(df.repartition(7), "grp", 10, "id")
    assert sorted(r.id for r in got.collect()) == sorted(r.id for r in again.collect())
    # salt rotates the sample
    rotated = stratified_sample(df, "grp", 10, "id", salt="v2")
    assert sorted(r.id for r in rotated.collect()) != sorted(r.id for r in got.collect())
    # NULL keys are excluded, not sampled as a block
    with_null = df.union(spark.createDataFrame([(None, "a")], df.schema))
    assert stratified_sample(with_null, "grp", 50, "id").count() == 50


# ---- bottom-k deterministic sample ------------------------------------


def test_bottomk_deterministic_and_sized(spark):
    from dablooms_spark.operators.sampling import bottomk_sample

    df = spark.range(0, 2_000).select(F.col("id").alias("doc_id"))
    a = [r["doc_id"] for r in bottomk_sample(df, "doc_id", 50).collect()]
    b = [r["doc_id"] for r in
         bottomk_sample(df.repartition(17), "doc_id", 50).collect()]
    assert len(a) == 50 and a == b
    # an independent salt draws a different set
    c = [r["doc_id"] for r in
         bottomk_sample(df, "doc_id", 50, salt="v2").collect()]
    assert set(a) != set(c)


def test_bottomk_is_mergeable(spark):
    """bottom-k of a union == bottom-k over the concatenated per-part
    bottom-ks — the KMV mergeability that lets the plan run as
    per-partition heaps with no shuffle."""
    from dablooms_spark.operators.sampling import bottomk_sample

    left = spark.range(0, 1_000).select(F.col("id").alias("doc_id"))
    right = spark.range(1_000, 2_000).select(F.col("id").alias("doc_id"))
    direct = bottomk_sample(left.unionAll(right), "doc_id", 32)
    merged = bottomk_sample(
        bottomk_sample(left, "doc_id", 32)
        .unionAll(bottomk_sample(right, "doc_id", 32)),
        "doc_id", 32,
    )
    assert [tuple(r) for r in direct.collect()] == [
        tuple(r) for r in merged.collect()
    ]


def test_bottomk_plan_take_ordered(spark):
    from dablooms_spark.operators.sampling import bottomk_sample

    df = spark.range(0, 1_000).select(F.col("id").alias("doc_id"))
    plan = bottomk_sample(df, "doc_id", 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


# ---- weighted (A-Res) deterministic sample -----------------------------


def _ares_priority_py(key, weight, salt=""):
    import hashlib

    v = int(hashlib.md5((salt + str(key)).encode()).hexdigest()[:13], 16)
    u = (v + 0.5) / float(1 << 52)
    return u ** (1.0 / float(weight))


def test_weighted_sample_matches_reference_formula(spark):
    """Spark's Catalyst priority (conv/md5/pow) selects exactly the
    top-k the pure-Python A-Res formula selects — the same formula the
    DuckDB oracle runs in SQL."""
    from dablooms_spark.operators.sampling import weighted_sample

    rows = [(i, 1 + (i * 7) % 100) for i in range(1_000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 40).collect()]
    want = [
        k for k, _ in sorted(
            rows, key=lambda kw: (-_ares_priority_py(kw[0], kw[1]), kw[0])
        )[:40]
    ]
    assert got == want


def test_weighted_sample_weight_monotone_and_stable(spark):
    """Raising one key's weight can only improve that key's rank;
    everything is a pure function of (salt, key, weight) so a
    repartition reproduces the same sample."""
    from dablooms_spark.operators.sampling import weighted_sample

    rows = [(i, 10) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    base = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 25).collect()}
    outsider = sorted(set(range(500)) - base)[0]
    boosted = spark.createDataFrame(
        [(i, 100_000 if i == outsider else w) for i, w in rows],
        "doc_id long, w long",
    )
    bumped = {
        r["doc_id"]
        for r in weighted_sample(boosted, "doc_id", "w", 25).collect()
    }
    assert outsider in bumped
    assert bumped - {outsider} <= base  # others' priorities untouched
    again = [
        r["doc_id"]
        for r in weighted_sample(df.repartition(13), "doc_id", "w", 25).collect()
    ]
    assert set(again) == base


def test_weighted_sample_inclusion_tracks_weight():
    """Statistical sanity on the formula itself (numpy-speed, no
    Spark): over many salts, heavy keys (w=9) appear ~9x as often as
    light keys (w=1) while the sample is small vs the population."""
    heavy = list(range(100))          # w = 9
    light = list(range(100, 1_000))   # w = 1
    hits_h = hits_l = 0
    for s in range(40):
        pri = [
            (_ares_priority_py(k, 9 if k < 100 else 1, salt=str(s)), k)
            for k in heavy + light
        ]
        top = {k for _, k in sorted(pri, reverse=True)[:50]}
        hits_h += len(top & set(heavy))
        hits_l += len(top & set(light))
    rate_h = hits_h / (40 * 100)
    rate_l = hits_l / (40 * 900)
    assert 6.0 < rate_h / rate_l < 12.0, (rate_h, rate_l)


def test_weighted_sample_mergeable_and_plan(spark):
    """Top-k of a union == top-k of per-part top-ks (mergeable
    summary), and the plan is TakeOrderedAndProject — no Exchange."""
    from dablooms_spark.operators.sampling import weighted_sample

    mk = lambda lo, hi: spark.createDataFrame(
        [(i, 1 + i % 50) for i in range(lo, hi)], "doc_id long, w long"
    )
    left, right = mk(0, 800), mk(800, 1_600)
    direct = weighted_sample(left.unionAll(right), "doc_id", "w", 32)
    merged = weighted_sample(
        weighted_sample(left, "doc_id", "w", 32)
        .unionAll(weighted_sample(right, "doc_id", "w", 32)),
        "doc_id", "w", 32,
    )
    assert [tuple(r) for r in direct.collect()] == [
        tuple(r) for r in merged.collect()
    ]
    plan = (
        weighted_sample(left, "doc_id", "w", 8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange" not in plan, plan


def test_weighted_sample_drops_nonpositive_weights(spark):
    from dablooms_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, None), (5, 2)], "doc_id long, w long"
    )
    got = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 10).collect()}
    assert got == {1, 5}
