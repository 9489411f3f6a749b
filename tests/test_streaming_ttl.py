"""Streaming TTL dedup (rotating generations in group state).

Covers the state serde framing, the updater's sliding-TTL semantics
(refresh-on-sighting, re-emit after a silent window, watermark-driven
whole-generation eviction) via a fake GroupState, and the end-to-end
stream against the NOT-EXISTS oracle.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from dablooms_spark.core.counting_bloom import CountingBloom
from dablooms_spark.streaming.ttl import (
    _GEN,
    _KEY,
    decode_ttl_state,
    encode_ttl_state,
    make_ttl_updater,
)

DAY = 86400


class _FakeState:
    def __init__(self, value=None, wm_ms=-1):
        self._value = value
        self._wm_ms = wm_ms
        self.removed = False

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, value):
        self._value = value

    def remove(self):
        self._value, self.removed = None, True

    def getCurrentWatermarkMs(self):
        return self._wm_ms


def test_ttl_state_serde_roundtrip():
    a = CountingBloom(100, 0.01)
    b = CountingBloom(100, 0.01)
    a.add(np.array([b"x", b"y"], dtype=object))
    b.add(np.array([b"z"], dtype=object))
    blob = encode_ttl_state({7: a, -3: b}, num_shards=16)
    gens, shards = decode_ttl_state(blob)
    assert shards == 16 and sorted(gens) == [-3, 7]
    assert gens[7].to_bytes() == a.to_bytes()
    assert gens[-3].to_bytes() == b.to_bytes()
    with pytest.raises(ValueError, match="bad magic"):
        decode_ttl_state(b"JUNKJUNK" + blob)


def _mk_updater(window=3, num_shards=1):
    return make_ttl_updater(
        gen_sec=DAY, window=window, cap_shard=64, error_rate=0.01,
        num_shards=num_shards, out_columns=["k", "ts"], ts_col="ts",
        order_cols=None,
    )


def _batch(rows):
    """rows: list of (key, gen). ts derives from gen (noon of day)."""
    return pd.DataFrame(
        {
            "k": [k for k, _ in rows],
            "ts": pd.to_datetime([g * DAY * 10**9 + 12 * 3600 * 10**9 for _, g in rows]),
            _KEY: [k for k, _ in rows],
            _GEN: [g for _, g in rows],
        }
    )


def _run(upd, state, rows):
    out = list(upd((0,), iter([_batch(rows)]), state))
    return [] if not out else list(pd.concat(out)["k"])


def test_updater_sliding_ttl_semantics():
    upd = _mk_updater(window=3)
    st = _FakeState()
    # gen 0: first sighting emits
    assert _run(upd, st, [("A", 0)]) == ["A"]
    # gens 1, 4, 5 in one batch, processed ascending: g1's window
    # (-2,1] holds g0 → suppressed but REFRESHES gen 1; g4's window
    # (1,4] = {2,3,4} holds nothing (the g1 sighting expired) →
    # re-emitted; g5's window (2,5] holds g4 → suppressed
    assert _run(upd, st, [("A", 4), ("A", 1), ("A", 5)]) == ["A"]
    # in-window repeat after the batch: suppressed (g5 marked)
    assert _run(upd, st, [("A", 6)]) == []
    # three silent generations after g6: re-emitted
    assert _run(upd, st, [("A", 9)]) == ["A"]
    # same-generation repeat: suppressed
    assert _run(upd, st, [("A", 9)]) == []
    gens, shards = decode_ttl_state(bytes(st.get[0]))
    assert sorted(gens) == [0, 1, 4, 5, 6, 9] and shards == 1


def test_updater_watermark_evicts_whole_generations():
    upd = _mk_updater(window=2)
    st = _FakeState()
    _run(upd, st, [("A", 0), ("B", 1), ("C", 5)])
    assert sorted(decode_ttl_state(bytes(st.get[0]))[0]) == [0, 1, 5]
    # watermark at gen 6 noon: gens <= 6-2=4 evict; 5 survives
    st._wm_ms = (6 * DAY + 12 * 3600) * 1000
    _run(upd, st, [("D", 6)])
    assert sorted(decode_ttl_state(bytes(st.get[0]))[0]) == [5, 6]
    # evicted A re-emits (out of window anyway); in-window C suppressed
    assert sorted(_run(upd, st, [("A", 6), ("C", 6)])) == ["A"]
    # a fully-evicted shard removes its state row instead of storing
    # an empty frame
    st2 = _FakeState()
    _run(upd, st2, [("A", 0)])
    st2._wm_ms = 100 * DAY * 1000
    _run(upd, st2, [])
    assert st2.removed and not st2.exists


def test_updater_late_rows_dropped():
    upd = _mk_updater(window=3)
    st = _FakeState(wm_ms=(5 * DAY) * 1000)  # watermark: gen-5 midnight
    # gen-2 row is older than the watermark: dropped, no state write
    assert _run(upd, st, [("A", 2)]) == []
    assert not st.exists
    # gen-5 row (noon, past the watermark) admits normally
    assert _run(upd, st, [("A", 5)]) == ["A"]


def test_updater_shard_stamp_mismatch_raises():
    upd8 = make_ttl_updater(
        gen_sec=DAY, window=2, cap_shard=64, error_rate=0.01,
        num_shards=8, out_columns=["k", "ts"], ts_col="ts",
    )
    st = _FakeState()
    list(upd8((0,), iter([_batch([("A", 0)])]), st))
    upd4 = make_ttl_updater(
        gen_sec=DAY, window=2, cap_shard=64, error_rate=0.01,
        num_shards=4, out_columns=["k", "ts"], ts_col="ts",
    )
    with pytest.raises(ValueError, match="num_shards=8"):
        list(upd4((0,), iter([_batch([("A", 1)])]), _FakeState(value=st.get)))


def _exact_ttl_set(pdf, gen_sec, window):
    """The NOT-EXISTS oracle in pandas: emit iff no earlier same-key
    row has generation > gen - window."""
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    last_gen: dict = {}
    out = []
    for r in pdf.itertuples():
        g = int(r.ts.timestamp() // gen_sec)
        prev = last_gen.get(r.key)
        if prev is None or prev <= g - window:
            out.append(r.event_id)
        last_gen[r.key] = g  # every sighting refreshes
    return set(out)


def test_streaming_ttl_end_to_end(spark, tmp_path_factory):
    """Single availableNow batch over sf0.001 events: the emitted set
    equals the exact sliding-TTL computation (zero false-positive
    suppressions at this load), and keys silent for >= window
    generations re-emit."""
    from pyspark.sql import functions as F

    from dablooms_spark.streaming import streaming_ttl_first_seen

    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("event_id", "ts", F.concat_ws(":", "user_id", "event_type").alias("key"))
    )
    src = str(tmp_path_factory.mktemp("ttl_src")) + "/in"
    events.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_ttl_first_seen(
        stream, "key", "ts", "2 days", window=3,
        capacity_per_generation=20000, error_rate=0.01, num_shards=8,
        order_cols=["event_id"],
    )
    ckpt = str(tmp_path_factory.mktemp("ttl_ckpt"))
    q = (
        out.writeStream.format("memory").queryName("ttl_sink")
        .outputMode("update").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        r.event_id for r in spark.sql("select event_id from ttl_sink").collect()
    }
    exact = _exact_ttl_set(events.toPandas(), 2 * DAY, 3)
    assert got == exact
    # the fixture genuinely exercises re-emission: some key emits twice
    emitted = spark.sql("select event_id from ttl_sink")
    per_key = (
        events.join(emitted, "event_id")
        .groupBy("key").count().filter("count > 1").count()
    )
    assert per_key > 0, "fixture never re-emitted a key; weak test"
