"""Counter-sum / bit-density cardinality — core identities and the
distributed blob-rows operator."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dablooms_spark.core.counting_bloom import CountingBloom
from dablooms_spark.core.scaling_bloom import ScalingBloom
from dablooms_spark.operators.cardinality import (
    blob_counter_stats,
    counter_cardinality,
    density_cardinality,
)
from dablooms_spark.operators.sharded import build_sharded_counting_bloom


def _keys(n, prefix="k"):
    return [f"{prefix}{i}".encode() for i in range(n)]


def test_added_count_exact_adds():
    cb = CountingBloom(10_000, 0.01)
    cb.add(_keys(1_000))
    n, exact = cb.added_count()
    assert (n, exact) == (1_000, True)
    assert cb.counter_sum() == 1_000 * cb.geometry.nfuncs


def test_added_count_tracks_removes():
    cb = CountingBloom(10_000, 0.01)
    cb.add(_keys(1_000))
    cb.remove(_keys(300))
    n, exact = cb.added_count()
    assert (n, exact) == (700, True)


def test_added_count_merge_of_overlapping_partials():
    # duplicates across partials ADD in the counter-sum — the header
    # count dedups nothing either; both sides agree on total adds
    a = CountingBloom(10_000, 0.01)
    b = CountingBloom(10_000, 0.01)
    a.add(_keys(600))
    b.add(_keys(900))  # first 600 overlap
    merged = a.merge(b)
    n, exact = merged.added_count()
    assert (n, exact) == (1_500, True)


def test_added_count_saturation_flags_inexact():
    cb = CountingBloom(10_000, 0.01)
    for _ in range(20):  # same key 20 times → its counters clip at 15
        cb.add([b"hot"])
    n, exact = cb.added_count()
    assert not exact
    assert n <= 20  # clipped sum is a lower bound


def test_density_estimate_within_five_percent():
    cb = CountingBloom(50_000, 0.01)
    cb.add(_keys(20_000))
    est = cb.density_estimate()
    assert abs(est - 20_000) / 20_000 < 0.05


def test_density_estimate_survives_saturation():
    cb = CountingBloom(50_000, 0.01)
    keys = _keys(20_000)
    for _ in range(3):
        cb.add(keys)  # triples every counter; zero/nonzero unchanged
    est = cb.density_estimate()
    assert abs(est - 20_000) / 20_000 < 0.05


def test_scaling_bloom_added_count_across_layers():
    sb = ScalingBloom(capacity=500, error_rate=0.01)
    ids = np.arange(1_600)
    keys = _keys(1_600)
    sb.add(keys, ids)
    assert len(sb.layers) > 1
    n, exact = sb.added_count()
    assert (n, exact) == (1_600, True)
    sb.remove(keys[:100], ids[:100])
    n, exact = sb.added_count()
    assert (n, exact) == (1_500, True)
    assert abs(sb.density_estimate() - 1_500) / 1_500 < 0.1


def test_counter_cardinality_sharded(spark):
    df = spark.range(0, 5_000).select(F.col("id").cast("string").alias("k"))
    blobs = build_sharded_counting_bloom(
        df, "k", capacity=20_000, error_rate=0.01, num_shards=8
    )
    row = counter_cardinality(blobs).collect()[0]
    assert (row["n_adds"], row["exact"]) == (5_000, True)
    est = density_cardinality(blobs).collect()[0]["n_est"]
    assert abs(est - 5_000) / 5_000 < 0.05
    stats = blob_counter_stats(blobs).collect()
    assert len(stats) == 8
    assert sum(r["adds"] for r in stats) == 5_000
    assert all(r["exact"] for r in stats)


def test_counter_cardinality_empty_blob_rows(spark):
    empty = spark.createDataFrame([], "shard long, blob binary, n long")
    row = counter_cardinality(empty).collect()[0]
    assert (row["n_adds"], row["exact"]) == (0, True)
    assert density_cardinality(empty).collect()[0]["n_est"] == 0.0


# ---- property: the counter-sum identity under arbitrary histories ----

from hypothesis import given, settings, strategies as st


@settings(max_examples=30, deadline=None)
@given(
    ops=st.lists(
        st.tuples(st.integers(min_value=0, max_value=199),
                  st.integers(min_value=1, max_value=4)),
        min_size=1, max_size=60,
    ),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
def test_counter_sum_identity_random_histories(ops, seed):
    """For any interleaving of adds and removes-of-present-keys,
    sum(counters) == nfuncs * (adds - removes) exactly, as long as no
    per-key multiplicity can reach the 4-bit ceiling."""
    cb = CountingBloom(5_000, 0.01, seed=seed)
    live: dict[int, int] = {}
    n_adds = n_removes = 0
    for key, mult in ops:
        if live.get(key, 0) + mult > 10:
            continue  # keep every key's own counters far from 15
        kb = [f"k{key}".encode()] * mult
        if live.get(key, 0) > 0 and (key + mult) % 3 == 0:
            take = min(mult, live[key])
            cb.remove(kb[:take])
            live[key] -= take
            n_removes += take
        else:
            cb.add(kb)
            live[key] = live.get(key, 0) + mult
            n_adds += mult
    n, exact = cb.added_count()
    assert n == n_adds - n_removes
    # exactness may only be lost to hash-collision pileups ON TOP of
    # legitimate multiplicities; with <=10 per key and 200 keys in a
    # 5k-capacity filter a 15 is effectively impossible
    assert exact
