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


def host_burstiness(events: DataFrame, host_col: str = "host",
                    ts_col: str = "ts", z_thresh: float = 2.0) -> DataFrame:
    """Per-host daily-volume anomaly detection: a crawl-operations
    alarm for hosts whose fetch/event count on one day spikes against
    their own history (link-farm activation, scraper loops, breaking
    news) — the signal adaptive recrawl and politeness budgeting react
    to.

    Output: one row per (host, day) with the day count, the host's
    n_days / total / sample variance, the z-score, and is_burst =
    |z| > z_thresh.  Hosts with < 2 active days get NULL z (no
    variance).

    Exactness: counts aggregate to bigints; z is computed from exact
    integer co-moments in one fixed expression —

      z = (c*n - total) / (n * sqrt((n*ssq - total^2) / (n*(n-1))))

    (numerator bigint; sqrt/divisions are IEEE-correctly-rounded on
    identical operands in any engine).  Zero-variance hosts get NULL z.
    Scale shape: one groupBy (host, day) with map-side combine, then
    one window exchange on host — no self-join against a stats
    dimension table."""
    d = events.select(F.col(host_col).alias("host"),
                      F.to_date(F.col(ts_col)).alias("day"))
    daily = d.groupBy("host", "day").agg(
        F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("host")
    st = daily.select(
        "host", "day", "c",
        F.count(F.lit(1)).over(w).alias("n_days"),
        F.sum("c").over(w).alias("total"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("ssq"))
    n = F.col("n_days")
    var_num = n * F.col("ssq") - F.col("total") * F.col("total")
    z = F.when(
        (n > 1) & (var_num > 0),
        (F.col("c") * n - F.col("total")).cast("double")
        / (n.cast("double")
           * F.sqrt(var_num.cast("double")
                    / (n * (n - 1)).cast("double"))))
    return st.select(
        "host", "day", F.col("c").cast("long").alias("c"),
        F.col("n_days").cast("long").alias("n_days"),
        F.col("total").cast("long").alias("total"),
        F.col("ssq").cast("long").alias("ssq"),
        z.alias("z"),
        F.when(z.isNotNull(), F.abs(z) > z_thresh).alias("is_burst"))
