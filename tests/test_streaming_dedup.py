"""Streaming first-seen dedup: hard no-duplicate guarantee, ε-bounded
first-occurrence loss, bounded state."""

from pyspark.sql import functions as F


def test_streaming_first_seen(spark, tmp_path_factory):
    from dablooms_spark.streaming import streaming_first_seen

    src = str(tmp_path_factory.mktemp("fs_src")) + "/in"
    # batch 1: keys 0..399; batch 2: keys 200..599 (200 dups, 200 new)
    b1 = spark.range(0, 400).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        F.col("id").alias("payload"),
    )
    b2 = spark.range(200, 600).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        (F.col("id") + 10_000).alias("payload"),
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_first_seen(
        stream, "key", capacity=2000, error_rate=0.01, num_shards=4
    )
    assert set(out.columns) == {"key", "payload"}
    ckpt = str(tmp_path_factory.mktemp("fs_ckpt"))
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from first_seen").collect()

    emitted = [r["key"] for r in rows]
    # HARD guarantee: no key emitted twice (blooms never false-negative)
    assert len(emitted) == len(set(emitted))
    # every emitted key is genuine and carries its FIRST payload
    payloads = {r["key"]: r["payload"] for r in rows}
    for k, p in payloads.items():
        i = int(k[1:])
        # keys < 400 first appear in batch 1 (payload = i); keys >= 400
        # only exist in batch 2 (payload = i + 10000)
        expected = i if i < 400 else i + 10_000
        assert p == expected, f"{k}: non-first payload {p} emitted"
    # ε-bounded loss: ≥ 99% of the 600 distinct keys surface at 1% ε
    assert len(set(emitted)) >= 594
    # keys unique to batch 2 really arrive through the second batch
    assert sum(1 for k in emitted if int(k[1:]) >= 400) >= 194


def test_streaming_first_seen_state_is_blob_sized(spark, tmp_path_factory):
    """State per shard is one filter blob: re-running with 10x the
    rows must not grow state beyond the fixed geometry."""
    from dablooms_spark.core.counting_bloom import CountingBloom

    cb = CountingBloom(1000, 0.01)
    cb.add([f"k{i}".encode() for i in range(1000)])
    at_capacity = len(cb.to_bytes())
    # dense counters bound the blob: state size is geometry-, not
    # stream-length-, dependent
    assert at_capacity <= cb.geometry.size + 128
    # hammering the same keys 5x more must not grow the blob
    for _ in range(5):
        cb2 = CountingBloom(1000, 0.01)
        cb2.add([f"k{i}".encode() for i in range(1000)])
        cb = cb.merge(cb2)
    assert len(cb.to_bytes()) <= cb.geometry.size + 128


def test_streaming_first_seen_event_time_late_data(spark, tmp_path_factory):
    """Watermark semantics: rows older than the watermark are dropped
    before the stateful operator (a late FIRST occurrence beyond the
    watermark is lost), slightly-late rows inside the watermark are
    admitted, and within a batch the EARLIEST-event-time row per key
    is the one emitted."""
    import datetime as dt

    from pyspark.sql import functions as F

    from dablooms_spark.streaming import streaming_first_seen_event_time

    day20 = dt.datetime(2024, 1, 20, 10, 0, 0)
    src = str(tmp_path_factory.mktemp("fs_et_src"))
    ckpt = str(tmp_path_factory.mktemp("fs_et_ckpt"))

    # batch 1: k0..k9 at day 20; k0 twice (10:00 and 09:00 — the
    # earlier row must be the emitted one)
    b1 = [(f"k{i}", day20) for i in range(10)]
    b1.append(("k0", day20 - dt.timedelta(hours=1)))
    # batch 2: k5..k14 at day 1 (beyond the 1h watermark -> dropped;
    # k10..k14 are lost first occurrences), k20 thirty minutes behind
    # the frontier (inside the watermark -> admitted)
    b2 = [(f"k{i}", dt.datetime(2024, 1, 1, 0, 0, 0)) for i in range(5, 15)]
    b2.append(("k20", day20 - dt.timedelta(minutes=30)))

    schema = "key string, ts timestamp"
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_first_seen_event_time(
        stream, "key", "ts", capacity=10_000, error_rate=0.01,
        delay="1 hour", num_shards=4,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("fs_et_sink")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = {r["key"]: r["ts"] for r in spark.sql("SELECT * FROM fs_et_sink").collect()}
    assert set(rows) == {f"k{i}" for i in range(10)} | {"k20"}
    # order_col=ts: k0's emitted row is the 09:00 one
    assert rows["k0"] == day20 - dt.timedelta(hours=1)
    spark.catalog.dropTempView("fs_et_sink")


def test_first_seen_shard_sizing_defaults_and_warning(spark):
    """shards ~ capacity/1e6 (floor 8); an over-budget per-shard blob
    warns instead of silently committing to a multi-GB state rewrite
    per micro-batch."""
    import warnings as _w

    from dablooms_spark.core.geometry import BloomGeometry
    from dablooms_spark.streaming import (
        default_first_seen_shards,
        streaming_first_seen,
    )

    assert default_first_seen_shards(1_000) == 8
    assert default_first_seen_shards(10**8) == 100
    assert default_first_seen_shards(10**10) == 10_000
    # per-shard blob at the default sizing stays ~5 MB dense
    shards = default_first_seen_shards(10**8)
    assert BloomGeometry(10**8 // shards, 0.01).num_nibble_bytes < 6 << 20

    # a deliberately under-sharded stream warns (plan-time only — no
    # query started)
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .withColumn("key", F.col("value").cast("string"))
    )
    with _w.catch_warnings(record=True) as got:
        _w.simplefilter("always")
        streaming_first_seen(
            stream, "key", capacity=400_000_000, error_rate=0.01, num_shards=8
        )
    assert any("state budget" in str(w.message) for w in got)


class _FakeGroupState:
    """Minimal stand-in for GroupState: exists/get/update + watermark."""

    def __init__(self, value=None, wm_ms=-1):
        self._value = value
        self._wm_ms = wm_ms
        self.update_calls = 0

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, value):
        self._value = value
        self.update_calls += 1

    def getCurrentWatermarkMs(self):
        return self._wm_ms


def test_first_seen_updater_skips_unchanged_state():
    """A micro-batch that adds no fresh key must NOT rewrite the
    blob-sized state value — at a dedup stream's steady state most
    batches are all-duplicates and the skip removes the dominant
    per-batch cost (write ∝ filter size, not batch size)."""
    import pandas as pd

    from dablooms_spark.streaming.dedup import _KEY, make_first_seen_updater

    update = make_first_seen_updater(
        capacity=10_000, error_rate=0.01, num_shards=1,
        out_columns=["k", "v"],
    )
    state = _FakeGroupState()

    def batch(keys, vals):
        return iter([pd.DataFrame({"k": keys, "v": vals, _KEY: keys})])

    # batch 1: all fresh -> emit all, state written
    out1 = pd.concat(list(update((0,), batch(["a", "b"], [1, 2]), state)))
    assert sorted(out1["k"]) == ["a", "b"] and state.update_calls == 1

    # batch 2: all duplicates -> no rows, NO state rewrite
    out2 = list(update((0,), batch(["a", "b"], [3, 4]), state))
    assert out2 == [] and state.update_calls == 1

    # batch 3: mixed -> only the fresh key, one more write
    out3 = pd.concat(list(update((0,), batch(["b", "c"], [5, 6]), state)))
    assert list(out3["k"]) == ["c"] and state.update_calls == 2

    # restore path: a NEW state object carrying the old blob still
    # dedups (blooms have no false negatives) and still skips writes
    state2 = _FakeGroupState(value=state.get)
    out4 = list(update((0,), batch(["a", "c"], [7, 8]), state2))
    assert out4 == [] and state2.update_calls == 0

    # empty-shard first touch persists the empty filter exactly once
    state3 = _FakeGroupState()
    out5 = list(update((0,), iter([pd.DataFrame({"k": [], "v": [], _KEY: []})]), state3))
    assert out5 == [] and state3.update_calls == 1


def test_first_seen_updater_late_filter_uses_session_tz():
    """getCurrentWatermarkMs is epoch-UTC, but Arrow hands NAIVE
    timestamp columns to applyInPandasWithState rendered in the
    SESSION timezone. The cutoff must be converted into that zone:
    with session tz America/New_York (UTC-5 in January), an on-time
    row's naive wall clock reads 5h EARLIER than its UTC instant, and
    a naive-UTC comparison would wrongly drop it."""
    import pandas as pd

    from dablooms_spark.streaming.dedup import _KEY, make_first_seen_updater

    wm_utc = pd.Timestamp("2026-01-01 12:00:00", tz="UTC")
    wm_ms = int(wm_utc.value // 1_000_000)

    def run(session_tz, naive_ts):
        update = make_first_seen_updater(
            capacity=10_000, error_rate=0.01, num_shards=1,
            out_columns=["k", "ts"], late_ts_col="ts",
            session_tz=session_tz,
        )
        state = _FakeGroupState(wm_ms=wm_ms)
        pdf = pd.DataFrame({
            "k": [f"k{i}" for i in range(len(naive_ts))],
            "ts": pd.to_datetime(naive_ts),
        })
        pdf[_KEY] = pdf["k"]
        out = list(update((0,), iter([pdf]), state))
        return sorted(pd.concat(out)["k"]) if out else []

    # NY wall times: 07:00 naive == the watermark instant, 08:00 is
    # one hour on-time (13:00 UTC), 06:00 is one hour late (11:00 UTC)
    kept = run("America/New_York",
               ["2026-01-01 06:00:00", "2026-01-01 07:00:00",
                "2026-01-01 08:00:00"])
    assert kept == ["k1", "k2"]

    # UTC session: the same instants in UTC wall time agree
    kept_utc = run("UTC",
                   ["2026-01-01 11:00:00", "2026-01-01 12:00:00",
                    "2026-01-01 13:00:00"])
    assert kept_utc == ["k1", "k2"]

    # unparseable tz falls back to UTC with a warning, not a crash
    import warnings as _w
    with _w.catch_warnings(record=True) as got:
        _w.simplefilter("always")
        kept_bad = run("no/such_zone",
                       ["2026-01-01 11:00:00", "2026-01-01 13:00:00"])
    assert kept_bad == ["k1"]
    assert any("session timezone" in str(w.message) for w in got)


def test_first_seen_updater_num_shards_pinned_across_restart():
    """State blobs are stamped with num_shards; restarting the stream
    with a different value re-routes keys to shards missing their
    bits, so the restore must fail loudly instead of re-emitting
    already-seen keys. Pre-stamp blobs (no footer) are caught via the
    derived per-shard capacity."""
    import pandas as pd
    import pytest

    from dablooms_spark.core.counting_bloom import CountingBloom
    from dablooms_spark.streaming.dedup import (
        _KEY, _stamp_shards, _unstamp_shards, make_first_seen_updater,
    )

    def batch(keys):
        pdf = pd.DataFrame({"k": keys})
        pdf[_KEY] = pdf["k"]
        return iter([pdf])

    mk = lambda shards: make_first_seen_updater(
        capacity=80_000, error_rate=0.01, num_shards=shards,
        out_columns=["k"],
    )
    state = _FakeGroupState()
    list(mk(8)(0, batch(["a", "b"]), state))

    # footer round-trips: stamped value decodes, num_shards recovered
    blob, n = _unstamp_shards(bytes(state.get[0]))
    assert n == 8 and CountingBloom.from_bytes(blob).count == 2

    # same num_shards restarts fine and still dedups
    assert list(mk(8)(0, batch(["a", "b"]), _FakeGroupState(state.get))) == []

    # changed num_shards (e.g. a new default) fails loudly
    with pytest.raises(ValueError, match="num_shards=8"):
        list(mk(16)(0, batch(["a"]), _FakeGroupState(state.get)))

    # pre-stamp checkpoint (no footer): geometry mismatch still caught
    legacy = CountingBloom(80_000 // 8, 0.01).to_bytes()
    with pytest.raises(ValueError, match="capacity"):
        list(mk(16)(0, batch(["a"]), _FakeGroupState((bytearray(legacy),))))
    # ...and a matching pre-stamp blob restores, then writes stamped
    st = _FakeGroupState((bytearray(legacy),))
    list(mk(8)(0, batch(["z"]), st))
    assert _unstamp_shards(bytes(st.get[0]))[1] == 8
