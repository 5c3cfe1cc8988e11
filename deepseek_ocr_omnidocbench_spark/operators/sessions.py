"""Gap-based sessionization over event/fetch logs (SURVEY §2.7 window
family; the batch analog of what a crawl scheduler needs per host:
burst detection, politeness windows, activity summaries).

Scale shape: ONE exchange on the session key — the lag window, the
running session counter, and the per-session aggregate all share the
same partitioning, so Catalyst plans a single shuffle followed by
sorted window passes and a partial-agg groupBy that reuses it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap_minutes: float = 30.0) -> DataFrame:
    """Assign a 1-based ``session_id`` per key: a new session starts at
    the first event and whenever the gap to the previous event exceeds
    ``gap_minutes``.  ``id_col`` breaks exact-timestamp ties so the
    assignment is deterministic under any partitioning."""
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    # TIMESTAMP_NTZ has no direct double cast; the session tz is pinned
    # to UTC (session.py), so NTZ -> TZ -> double is the naive epoch
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    prev = F.lag(epoch).over(w)
    new_session = (prev.isNull()
                   | ((epoch - prev) > F.lit(gap_minutes * 60.0)))
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return events.withColumn(
        "session_id", F.sum(new_session.cast("long")).over(run))


def session_stats(events: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  value_col: str = "value",
                  gap_minutes: float = 30.0) -> DataFrame:
    """Per-session summary: event count, epoch start, duration, value
    total — the table a politeness audit or activity report reads."""
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    s = sessionize(events, key_col=key_col, ts_col=ts_col, id_col=id_col,
                   gap_minutes=gap_minutes)
    return (s.groupBy(key_col, "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.min(epoch), 3).alias("start_s"),
                 F.round(F.max(epoch) - F.min(epoch), 3)
                 .alias("duration_s"),
                 F.round(F.sum(value_col), 6).alias("total_value")))
