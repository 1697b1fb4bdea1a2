"""Gap-based sessionization (pipelines/sessions.py) vs a direct python oracle,
plus the no-second-exchange plan property of session_stats."""

import datetime as dt

from pyspark_validator.pipelines.sessions import session_stats, sessionize


def _mk_events(spec):
    # spec: list of (event_id, user, minutes_offset)
    base = dt.datetime(2024, 1, 1)
    return [
        (eid, u, base + dt.timedelta(minutes=m)) for eid, u, m in spec
    ]


SPEC = [
    (0, 1, 0.0),
    (1, 1, 10.0),
    (2, 1, 41.0),   # 31 min gap -> new session
    (3, 1, 71.0),   # exactly 30 min -> SAME session (strict >)
    (4, 1, 101.001),  # 30m + 60ms -> new session
    (5, 2, 5.0),
    (6, 2, 5.0),    # identical ts -> tie broken by event_id, same session
    (7, 2, 2000.0),
    (8, 3, 0.0),    # single-event user
]


def _oracle(spec, gap_min=30.0):
    out = {}
    by_user = {}
    for eid, u, m in sorted(spec, key=lambda r: (r[1], r[2], r[0])):
        prev = by_user.get(u)
        if prev is None or (m - prev) * 60_000_000 > gap_min * 60_000_000:
            out[eid] = out.get(("n", u), 0) + 1
            out[("n", u)] = out[eid]
        else:
            out[eid] = out[("n", u)]
        by_user[u] = m
    return {k: v for k, v in out.items() if not isinstance(k, tuple)}


def test_sessionize_matches_python_oracle(spark):
    df = spark.createDataFrame(
        _mk_events(SPEC), "event_id long, user_id long, ts timestamp"
    )
    got = {
        r.event_id: r.session_seq
        for r in sessionize(df, gap_seconds=1800.0).collect()
    }
    assert got == _oracle(SPEC)
    # the boundary law explicitly: exactly-gap stays, gap+epsilon breaks
    assert got[3] == got[2]
    assert got[4] == got[3] + 1


def test_session_stats_exact_duration_and_single_exchange(spark):
    df = spark.createDataFrame(
        _mk_events(SPEC), "event_id long, user_id long, ts timestamp"
    )
    st = session_stats(df, gap_seconds=1800.0)
    rows = {(r.user_id, r.session_seq): r for r in st.collect()}
    assert rows[(1, 1)].n_events == 2
    assert abs(rows[(1, 1)].duration_sec - 600.0) < 1e-9
    assert rows[(3, 1)].n_events == 1 and rows[(3, 1)].duration_sec == 0.0
    # microsecond exactness across the .001-minute edge
    assert abs(rows[(1, 3)].duration_sec - 0.0) < 1e-12
    # the groupBy must reuse the window's hash partitioning on user_id:
    # exactly ONE exchange in the FINAL adaptive plan (the post-execution
    # formatted explain appends an "Initial Plan" section that duplicates
    # nodes — count only the executed tree)
    plan = st._sc._jvm.PythonSQLUtils.explainString(
        st._jdf.queryExecution(), "formatted"
    ).split("Initial Plan")[0]
    import re

    assert len(re.findall(r"\+- (?:\* )?Exchange", plan)) + len(
        re.findall(r"^(?:\* )?Exchange", plan, re.M)
    ) == 1, plan
