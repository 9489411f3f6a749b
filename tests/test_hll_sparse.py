"""Sparse-mode HLL tests: exactness under the m/8 threshold, lossless
sparse-to-dense upgrade, merge-order bit-identity across mode mixes,
serde versioning, and the grouped operator's exact regime."""

import itertools

import numpy as np

from dablooms_spark.core.hll import HyperLogLog
from dablooms_spark.core.serde import loads


def test_sparse_exact_and_serde_v2():
    h = HyperLogLog(p=14, sparse=True)
    keys = [f"k{i}" for i in range(1500)]
    h.add(keys)
    h.add(keys[:700])  # duplicates don't count
    assert h.is_sparse
    assert h.estimate() == 1500.0
    h2 = loads(h.to_bytes())
    assert h2.is_sparse and np.array_equal(h2.words, h.words)
    assert (h2.p, h2.seed) == (h.p, h.seed)


def test_sparse_upgrade_bit_identical_to_dense_build():
    dense = HyperLogLog(p=8)  # m=256 -> sparse threshold 32
    sparse = HyperLogLog(p=8, sparse=True)
    ks = [f"x{i}" for i in range(500)]
    dense.add(ks)
    sparse.add(ks)
    assert not sparse.is_sparse
    assert dense.to_bytes() == sparse.to_bytes()


def test_merge_any_order_any_mode_mix_bit_identical():
    ks = [f"x{i}" for i in range(500)]
    chunks = np.array_split(np.array(ks, dtype=object), 5)
    parts = []
    for i, ch in enumerate(chunks):
        s = HyperLogLog(p=8, sparse=(i % 2 == 0))
        s.add(list(ch))
        parts.append(s)
    outs = set()
    for perm in itertools.permutations(range(5)):
        m = parts[perm[0]]
        for j in perm[1:]:
            m = m.merge(parts[j])
        outs.add(m._as_dense_registers().tobytes())
    assert len(outs) == 1


def test_sparse_merge_stays_sparse_and_exact_under_threshold():
    a = HyperLogLog(p=14, sparse=True)
    a.add([f"a{i}" for i in range(900)])
    b = HyperLogLog(p=14, sparse=True)
    b.add([f"b{i}" for i in range(800)] + [f"a{i}" for i in range(100)])
    m = a.merge(b)
    assert m.is_sparse
    assert m.estimate() == 1700.0
    # blob never outgrows the dense register array
    assert len(m.to_bytes()) <= len(HyperLogLog(p=14).to_bytes())


def test_sparse_start_dense_accuracy_unchanged():
    h = HyperLogLog(p=14, sparse=True)
    h.add([f"z{i}" for i in range(200_000)])
    assert not h.is_sparse
    est = h.estimate()
    assert abs(est - 200_000) / 200_000 < 0.02, est


def test_approx_distinct_by_sparse_exact_regime(spark, sf_dir):
    from pyspark.sql import functions as F

    from dablooms_spark.operators.sketch_agg import approx_distinct_by

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct_by(
            events, "event_type", "user_id", p=14, sparse=True
        ).collect()
    }
    exact = {
        str(r["event_type"]): r["d"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert got == exact
