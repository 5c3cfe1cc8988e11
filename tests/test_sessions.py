"""Gap-based sessionization: boundary semantics, determinism, stats."""

from datetime import datetime

from pyspark.sql import functions as F

from deepseek_ocr_omnidocbench_spark.operators.sessions import (
    session_stats,
    sessionize,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")


def test_sessionize_gap_boundary(spark):
    t = lambda m, s=0: datetime(2024, 1, 1, 0, m, s)  # noqa: E731
    rows = [
        (0, t(0), 1, 1.0),
        (1, t(10), 1, 2.0),          # gap exactly 10 min -> SAME session
        (2, t(20, 1), 1, 3.0),       # 10 min 1 s -> NEW session
        (3, t(0), 2, 4.0),           # other user independent
    ]
    out = sessionize(_events(spark, rows), gap_minutes=10.0).collect()
    sid = {r.event_id: r.session_id for r in out}
    assert sid[0] == sid[1] == 1
    assert sid[2] == 2
    assert sid[3] == 1


def test_sessionize_exact_ts_tie_is_deterministic(spark):
    t0 = datetime(2024, 1, 1)
    rows = [(i, t0, 7, 1.0) for i in range(4)]
    df = _events(spark, rows)
    a = sessionize(df, gap_minutes=1.0).collect()
    b = sessionize(df.repartition(5), gap_minutes=1.0).collect()
    assert {r.event_id: r.session_id for r in a} == \
        {r.event_id: r.session_id for r in b}
    assert all(r.session_id == 1 for r in a)  # zero gaps: one session


def test_session_stats(spark):
    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [(0, t(0), 1, 1.5), (1, t(5), 1, 2.5),
            (2, t(30), 1, 4.0)]
    out = session_stats(_events(spark, rows), gap_minutes=10.0)
    got = {r.session_id: r for r in out.collect()}
    assert got[1].n_events == 2 and got[1].duration_s == 300.0
    assert got[1].total_value == 4.0
    assert got[2].n_events == 1 and got[2].duration_s == 0.0
    # one exchange in the whole plan: both windows and the aggregate
    # reuse the user_id partitioning (inspect pre-execution plan — the
    # post-AQE string repeats the tree in Final/Initial sections)
    fresh = session_stats(_events(spark, rows), gap_minutes=10.0)
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_sessionize_matches_python_reference(spark):
    """Randomized parity: sessionize vs an independent single-threaded
    reference over events with duplicate timestamps and many users."""
    import random as _r
    from datetime import datetime, timedelta

    rng = _r.Random(1234)
    base = datetime(2024, 1, 1)
    rows = []
    for eid in range(300):
        user = rng.randint(1, 8)
        ts = base + timedelta(seconds=rng.randint(0, 20000))
        rows.append((eid, ts, user, 1.0))
    gap_s = 600.0

    # reference: per user, sort by (ts, event_id), split on gap > 600 s
    ref = {}
    by_user: dict = {}
    for eid, ts, user, _v in rows:
        by_user.setdefault(user, []).append((ts, eid))
    for user, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() > gap_s:
                sid += 1
            ref[eid] = (user, sid)
            prev = ts

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    got = {r.event_id: (r.user_id, r.session_id)
           for r in sessionize(df, gap_minutes=10.0).collect()}
    assert got == ref


def test_host_burstiness(spark):
    import datetime as dt

    import pytest
    from deepseek_ocr_omnidocbench_spark.operators.sessions import (
        host_burstiness)

    def t(day, i):
        return dt.datetime(2026, 1, day, 10, i)

    rows = []
    # host a: 2,2,2,10 events over 4 days -> day-4 is a burst
    for day, k in [(1, 2), (2, 2), (3, 2), (4, 10)]:
        rows += [("a", t(day, i)) for i in range(k)]
    # host b: one active day -> NULL z
    rows += [("b", t(1, i)) for i in range(3)]
    # host c: constant 2/day -> zero variance -> NULL z
    rows += [("c", t(d, i)) for d in (1, 2) for i in range(2)]
    df = spark.createDataFrame(rows, ["host", "ts"])
    out = {(r.host, str(r.day)): r for r in host_burstiness(df).collect()}
    burst = out[("a", "2026-01-04")]
    # mean 4, sample var (4*112-256)/(4*3) = 16, sd 4 -> z = 1.5
    assert burst.z == pytest.approx(1.5)
    assert burst.is_burst is False
    quiet = out[("a", "2026-01-01")]
    assert quiet.z == pytest.approx(-0.5)
    assert out[("b", "2026-01-01")].z is None
    assert out[("c", "2026-01-01")].z is None
