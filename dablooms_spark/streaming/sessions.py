"""Streaming sessionization via Spark's built-in session_window.

The streaming complement of operators/sessions.py: the batch operator
assigns per-user session sequence numbers with window functions; here
the stream groups events into gap-merged session windows
(`F.session_window(ts, gap)`) and aggregates per (user, session) —
Spark's native dynamic-gap session state machine, not a custom
stateful operator, so watermark-based late-row dropping and state
eviction come from the engine (unlike applyInPandasWithState, where
streaming/windowed.py has to do both by hand).

Boundary semantics match the batch operator: session_window merges
touching intervals (next.start <= prev.start + gap — verified
empirically, a diff of exactly gap merges), so a new session starts
iff diff > gap, the same strict rule operators/sessions.py uses.

Outputs are epoch MICROseconds: session merging happens at the
timestamp's full microsecond precision, so emitting anything coarser
(ms) could disagree with an oracle that recomputes boundaries from
rounded values.

Scale shape: one shuffle on the grouping key; session merging and the
aggregate run inside Spark's streaming-session-window exec (partial
merge map-side since Spark 3.2's spark.sql.streaming.sessionWindow.
merge.sessions.in.local.partition). State per (user, open session),
evicted by watermark in append mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _epoch_us(col, is_ntz: bool):
    if is_ntz:
        origin = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        return F.timestamp_diff("MICROSECOND", origin, col)
    return F.unix_micros(col)


def session_window_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """One row per (user, session window): n_events, start_us, end_us.

    Works on a streaming OR batch DataFrame (session_window is valid
    in both; the batch form is the cross-check for the streaming one).
    end_us is the window end = last event + gap, per the session_window
    contract. TIMESTAMP_NTZ inputs (parquet scans) stay NTZ — epoch
    values come from calendar arithmetic, never a session-zone cast,
    so non-UTC sessions cannot shift them.

    watermark: required for streaming append mode (sessions emit once,
    when the watermark passes their end); omit for complete/update
    mode or batch."""
    is_ntz = dict(df.dtypes).get(ts_col) == "timestamp_ntz"
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(F.col(user_col), win)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            _epoch_us(F.col("session_window.start"), is_ntz).alias("start_us"),
            _epoch_us(F.col("session_window.end"), is_ntz).alias("end_us"),
            "n_events",
        )
    )
