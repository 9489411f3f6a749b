"""Gap-based sessionization — boundary semantics, determinism, plan."""

import datetime as dt

from pyspark.sql import functions as F

from dablooms_spark.operators.sessions import session_stats, sessionize


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(milliseconds=ms), i)
         for i, (u, ms) in enumerate(rows)],
        "user_id long, ts timestamp, event_id long",
    )


def test_session_boundaries_strict_gap(spark):
    gap = 1_000
    rows = [
        (1, 0), (1, 1_000),          # exactly gap → SAME session
        (1, 2_001),                  # gap+1 → new session
        (1, 2_500),
        (2, 0),                      # other user independent
    ]
    df = sessionize(_events(spark, rows), "user_id", "ts", gap, "event_id")
    got = {(r["user_id"], r["event_id"]): r["session_seq"]
           for r in df.collect()}
    assert got == {(1, 0): 0, (1, 1): 0, (1, 2): 1, (1, 3): 1, (2, 4): 0}


def test_session_stats_counts_and_bounds(spark):
    rows = [(7, 0), (7, 100), (7, 5_000), (7, 5_050), (7, 5_060)]
    out = session_stats(
        _events(spark, rows), "user_id", "ts", 1_000, "event_id"
    ).orderBy("session_seq").collect()
    assert [(r["session_seq"], r["n_events"]) for r in out] == [(0, 2), (1, 3)]
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert out[0]["start_ms"] == base and out[0]["end_ms"] == base + 100
    assert out[1]["start_ms"] == base + 5_000 and out[1]["end_ms"] == base + 5_060


def test_sessionize_deterministic_under_repartition(spark):
    rows = [(u, 37 * i % 10_000) for u in range(5) for i in range(40)]
    df = _events(spark, rows)
    a = sessionize(df, "user_id", "ts", 500, "event_id")
    b = sessionize(df.repartition(13), "user_id", "ts", 500, "event_id")
    cols = ["user_id", "event_id", "session_seq"]
    assert sorted(map(tuple, a.select(*cols).collect())) == sorted(
        map(tuple, b.select(*cols).collect())
    )


def test_session_stats_single_exchange(spark):
    """The window pass and the (user, session) aggregate must share one
    hash Exchange on user_id — a second shuffle would double the cost
    of the only shuffle this operator is allowed."""
    df = _events(spark, [(1, 0), (1, 10), (2, 0)])
    plan = session_stats(df, "user_id", "ts", 1_000, "event_id")._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_sessionize_timestamp_ntz_parity(spark):
    """Parquet scans yield TIMESTAMP_NTZ — the ntz path must produce
    the same epoch-ms values as the tz path, under any session tz."""
    rows = [(1, 0), (1, 100), (1, 5_000)]
    tz_df = _events(spark, rows)
    ntz_df = tz_df.select(
        "user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "event_id"
    )
    a = session_stats(tz_df, "user_id", "ts", 1_000, "event_id").collect()
    b = session_stats(ntz_df, "user_id", "ts", 1_000, "event_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
