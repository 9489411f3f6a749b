"""Built-in session_window sessionization: gap semantics (>= rule),
stream/batch agreement, micro-batch-split invariance, NTZ parity."""

import datetime as dt

from pyspark.sql import functions as F

from dablooms_spark.streaming.sessions import session_window_stats


def _df(spark, rows, schema="user_id long, ts timestamp"):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(milliseconds=ms))
         for u, ms in rows],
        schema,
    )


def test_session_window_gap_is_strict_boundary(spark):
    # diff == gap MERGES (touching intervals); diff > gap splits —
    # the same strict rule as the batch sessionizer
    rows = [(1, 0), (1, 1_000), (1, 2_001), (2, 0)]
    out = session_window_stats(
        _df(spark, rows), "user_id", "ts", gap="1 seconds"
    ).collect()
    per_user = sorted((r["user_id"], r["n_events"]) for r in out)
    assert per_user == [(1, 1), (1, 2), (2, 1)]
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
               .timestamp() * 1_000_000)
    s1 = [r for r in out if r["user_id"] == 1 and r["n_events"] == 2][0]
    assert s1["start_us"] == base
    assert s1["end_us"] == base + 2_000_000  # last event + gap


def test_streaming_matches_batch_and_batch_split(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sess_src"))
    ckpt = str(tmp_path_factory.mktemp("sess_ckpt"))
    # two files → two micro-batches with maxFilesPerTrigger=1; user 1's
    # session spans the file boundary, so state must merge across
    # micro-batches
    b1 = [(1, 0), (1, 400), (2, 0)]
    b2 = [(1, 800), (1, 10_000), (2, 20_000)]
    for b in (b1, b2):
        _df(spark, b).coalesce(1).write.mode("append").parquet(src)

    batch_rows = sorted(
        map(tuple, session_window_stats(
            spark.read.parquet(src), "user_id", "ts", gap="1 seconds"
        ).collect())
    )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = session_window_stats(stream, "user_id", "ts", gap="1 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    stream_rows = sorted(
        map(tuple, spark.sql("SELECT * FROM sess_sink").collect())
    )
    spark.catalog.dropTempView("sess_sink")
    assert stream_rows == batch_rows
    # user 1: [0,400,800] one session (diffs < 1s), [10_000] another
    n_by_user = sorted(
        (r[0], r[3]) for r in stream_rows
    )
    assert n_by_user == [(1, 1), (1, 3), (2, 1), (2, 1)]


def test_session_window_ntz_parity(spark):
    rows = [(1, 0), (1, 100), (1, 5_000)]
    tz_df = _df(spark, rows)
    ntz_df = tz_df.select(
        "user_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    a = sorted(map(tuple, session_window_stats(
        tz_df, "user_id", "ts", gap="1 seconds").collect()))
    b = sorted(map(tuple, session_window_stats(
        ntz_df, "user_id", "ts", gap="1 seconds").collect()))
    assert a == b
