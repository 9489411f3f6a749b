"""Late-data semantics of windowed_distinct_stream: Spark leaves
late-row filtering to the user function for arbitrary stateful ops,
so the updater itself must drop rows older than the watermark —
otherwise a late row for an already-evicted window resurrects it as a
fresh near-empty sketch (or kills the query: registering a timeout
at-or-below the watermark is illegal)."""

import datetime as dt


def test_late_rows_cannot_resurrect_evicted_window(spark, tmp_path_factory):
    from dablooms_spark.streaming.windowed import windowed_distinct_stream

    src = str(tmp_path_factory.mktemp("win_late_src"))
    ckpt = str(tmp_path_factory.mktemp("win_late_ckpt"))

    t = dt.datetime(2024, 1, 20, 10, 5, 0)

    # batch 1: three users in window 10:00-11:00 (W1) + one frontier
    # row at 13:00 that pushes the watermark to 12:30 -> W1 is closed
    # from batch 2 onward
    b1 = [("u1", t), ("u2", t), ("u3", t),
          ("fx", dt.datetime(2024, 1, 20, 13, 0, 0))]
    # batch 2: W1 has NO data, so its EventTimeTimeout fires (final
    # row); one on-time row + one slightly-late-but-admitted row
    # (12:40 >= watermark 12:30 -> kept, window 12:00-13:00)
    b2 = [("u4", dt.datetime(2024, 1, 20, 13, 5, 0)),
          ("u5", dt.datetime(2024, 1, 20, 12, 40, 0))]
    # batch 3: a LATE row for the EVICTED W1 — must be dropped, not
    # resurrect the window (and not crash the query via an illegal
    # timeout registration)
    b3 = [("ghost", dt.datetime(2024, 1, 20, 10, 10, 0))]

    schema = "user string, ts timestamp"
    for b in (b1, b2, b3):
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = windowed_distinct_stream(
        stream, "ts", "user", window="1 hour", watermark="30 minutes",
        sketch="theta",  # exact while under-full -> counts assertable
    )
    q = (
        out.writeStream.format("memory")
        .queryName("win_late_sink")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM win_late_sink").collect()
    spark.catalog.dropTempView("win_late_sink")

    w1 = dt.datetime(2024, 1, 20, 10, 0, 0)
    w1_rows = [r for r in rows if r["win_start"] == w1]
    finals = [r for r in rows if r["final"]]

    # W1 closed exactly once, with the pre-eviction count — and the
    # ghost row neither re-opened it (no fresh count-1 row) nor added
    # a second final
    assert [(r["final"], r["approx_distinct"]) for r in w1_rows] in (
        [(False, 3.0), (True, 3.0)],
        [(True, 3.0), (False, 3.0)],  # collect order is not guaranteed
    )
    assert len(finals) == 1 and finals[0]["win_start"] == w1

    # the slightly-late-but-inside-watermark row WAS admitted
    w12 = dt.datetime(2024, 1, 20, 12, 0, 0)
    assert any(
        r["win_start"] == w12 and r["approx_distinct"] == 1.0 for r in rows
    )
    # the 13:00 window saw both fx and u4
    w13 = dt.datetime(2024, 1, 20, 13, 0, 0)
    assert any(
        r["win_start"] == w13 and r["approx_distinct"] == 2.0 for r in rows
    )
