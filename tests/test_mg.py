"""Misra-Gries heavy-hitters tests: exact-regime equality, the
mergeable-summaries error bound, no-false-negative guarantee, serde,
and the distributed one-pass operator (SURVEY.md §2.3 companion
sketch beyond the reference surface)."""

from collections import Counter

import numpy as np
import pytest

from dablooms_spark.core.mg import MisraGries
from dablooms_spark.core.serde import loads


def _zipf_keys(n=20_000, classes=500, seed=7):
    rng = np.random.default_rng(seed)
    return [f"user{int(z) % classes}" for z in rng.zipf(1.5, n)]


def test_mg_exact_regime_counts_and_merge_any_order():
    keys = _zipf_keys()
    truth = Counter(keys)
    chunks = np.array_split(np.array(keys, dtype=object), 7)
    parts = []
    for ch in chunks:
        p = MisraGries(k=4096)
        p.add(list(ch))
        parts.append(p)
    # two different merge orders -> identical exact summaries
    fwd = parts[0]
    for p in parts[1:]:
        fwd = fwd.merge(p)
    rev = parts[-1]
    for p in reversed(parts[:-1]):
        rev = rev.merge(p)
    for m in (fwd, rev):
        assert m.max_error == 0
        assert {k.decode(): v for k, v in m.counts.items()} == dict(truth)
    assert fwd.to_bytes() == rev.to_bytes()  # canonical serde order


def test_mg_error_bound_and_sandwich():
    keys = _zipf_keys()
    truth = Counter(keys)
    chunks = np.array_split(np.array(keys, dtype=object), 7)
    m = None
    for ch in chunks:
        p = MisraGries(k=16)
        p.add(list(ch))
        m = p if m is None else m.merge(p)
    n = len(keys)
    # PODS'12 bound: cumulative error <= N/(k+1) (per-partial errors
    # are each bounded by their local N/(k+1); the merge sums them)
    assert 0 < m.max_error <= n // (16 + 1) + 7
    assert len(m.counts) <= 16
    for key, f in truth.items():
        lo, hi = m.query(key)
        assert lo <= f <= hi, (key, lo, f, hi)


def test_mg_no_false_negatives_above_error_floor():
    keys = _zipf_keys()
    truth = Counter(keys)
    m = MisraGries(k=16)
    m.add(keys)
    thr = m.max_error + 50
    hh = {t[0].decode() for t in m.heavy_hitters(thr)}
    for key, f in truth.items():
        if f >= thr:
            assert key in hh


def test_mg_weighted_add_and_buffer_path():
    m = MisraGries(k=64)
    m.add(["a", "b", "a"], counts=[2, 3, 5])
    assert m.query("a") == (7, 7)
    assert m.query("b") == (3, 3)
    assert m.total == 10

    keys = _zipf_keys(5_000)
    enc = [k.encode() for k in keys]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    mb = MisraGries(k=4096)
    mb.add_buffer(buf, offs, lens)
    ml = MisraGries(k=4096)
    ml.add(keys)
    assert mb.counts == ml.counts and mb.total == ml.total


def test_mg_serde_roundtrip_via_magic_loads():
    m = MisraGries(k=16)
    m.add(_zipf_keys(3_000))
    m2 = loads(m.to_bytes())
    assert isinstance(m2, MisraGries)
    assert (m2.k, m2.seed, m2.total, m2.max_error) == (
        m.k,
        m.seed,
        m.total,
        m.max_error,
    )
    assert m2.counts == m.counts
    with pytest.raises(ValueError):
        MisraGries(k=16).merge(MisraGries(k=32))


def test_heavy_hitters_mg_operator_exact_vs_groupby(spark, sf_dir):
    """One-pass distributed MG at k >= distinct == exact GROUP BY
    HAVING, and the approximate small-k run still sandwiches truth."""
    from pyspark.sql import functions as F

    from dablooms_spark.operators.sketch_agg import heavy_hitters_mg

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["user_id"]: (r["cnt_lo"], r["cnt_hi"])
        for r in heavy_hitters_mg(events, "user_id", min_count=5, k=8192).collect()
    }
    exact = {
        str(r["user_id"]): r["cnt"]
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 5)
        .collect()
    }
    assert {k: lo for k, (lo, hi) in got.items()} == exact
    assert all(lo == hi for lo, hi in got.values())

    truth_all = {
        str(r["user_id"]): r["cnt"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    approx = {
        r["user_id"]: (r["cnt_lo"], r["cnt_hi"])
        for r in heavy_hitters_mg(events, "user_id", min_count=1, k=8).collect()
    }
    for key, (lo, hi) in approx.items():
        assert lo <= truth_all[key] <= hi


def test_mg_sql_udaf_exact_regime(spark, sf_dir):
    """dablooms_mg_agg registered over SQL: per-group blobs whose
    entries are exact while distinct-per-group <= k."""
    from dablooms_spark.operators.udafs import register_sketch_udafs

    register_sketch_udafs(spark)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.createOrReplaceTempView("mg_events_v")
    rows = spark.sql(
        """
        SELECT event_type, dablooms_mg_agg(CAST(user_id AS STRING)) AS blob
        FROM mg_events_v GROUP BY event_type
        """
    ).collect()
    assert rows
    from pyspark.sql import functions as F

    for r in rows:
        sk = loads(bytes(r["blob"]))
        assert sk.max_error == 0
        exact = {
            str(x["user_id"]): x["cnt"]
            for x in events.filter(F.col("event_type") == r["event_type"])
            .groupBy("user_id")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        assert {k.decode(): v for k, v in sk.counts.items()} == exact
