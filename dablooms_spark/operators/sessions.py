"""Gap-based sessionization — pure window functions, one shuffle.

Standard web-analytics sessionizer (the reference's domain: bitly
click streams): events for a user belong to one session until a gap
longer than `gap_ms` separates two consecutive events; the next event
opens a new session.

Scale shape: exactly ONE hash shuffle on the user column, then two
window passes (lag → running sum) inside each partition and a partial
+ final aggregate that reuses the same partitioning — Catalyst plans
lag and the cumulative sum over the identical window spec without a
second Exchange. Hot users are bounded by the session aggregate's
map-side combine; there is no driver-side state and no Python in the
path (whole-stage codegen end to end). Ordering inside a user is made
total by (ts, tiebreak_col), so results are deterministic under any
input partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_ms(df: DataFrame, ts_col: str):
    """Epoch-millisecond expression for either timestamp flavor.

    TIMESTAMP uses unix_millis directly. TIMESTAMP_NTZ (what parquet
    scans yield) must NOT round-trip through a session-timezone cast —
    that would shift the absolute values (and lose rows in DST gaps)
    under non-UTC sessions; instead the naive value is differenced
    against a naive epoch origin, which is pure calendar arithmetic,
    identical under every session timezone."""
    c = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        origin = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        return F.timestamp_diff("MILLISECOND", origin, c)
    return F.unix_millis(c)


def sessionize(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    gap_ms: int,
    tiebreak_col: str,
) -> DataFrame:
    """Assign a per-user session sequence number to every event.

    Returns the input columns plus `session_seq` (long, 0-based per
    user in time order). A new session starts when the millisecond
    gap since the previous event of the same user exceeds gap_ms
    (strictly greater — a gap of exactly gap_ms stays in-session).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    ms = _epoch_ms(events, ts_col)
    prev = F.lag(ms).over(w)
    boundary = F.when(
        prev.isNull() | ((ms - prev) > F.lit(int(gap_ms))), F.lit(1)
    ).otherwise(F.lit(0))
    # running sum of boundaries − 1 → 0-based session index
    return events.withColumn(
        "session_seq", (F.sum(boundary).over(w) - F.lit(1)).cast("long")
    )


def session_stats(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    gap_ms: int,
    tiebreak_col: str,
) -> DataFrame:
    """One row per (user, session): n_events, start_ms, end_ms.

    start/end are epoch milliseconds (unix_millis) so the output is
    integer-typed and engine-portable. The aggregate groups on the
    same user key the window pass already partitioned by, so Catalyst
    serves it from the existing Exchange."""
    with_seq = sessionize(events, user_col, ts_col, gap_ms, tiebreak_col)
    ms = _epoch_ms(events, ts_col)
    return (
        with_seq.groupBy(F.col(user_col), F.col("session_seq"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ms).alias("start_ms"),
            F.max(ms).alias("end_ms"),
        )
    )
