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


def test_streaming_session_stats_batch_parity(spark):
    # session_window (native) == sessionize (window-algebra) on data with no
    # exact-boundary gaps — run both on the same static frame
    from pyspark_validator.streaming import streaming_session_stats

    spec = [(i, u, float(m)) for i, (u, m) in enumerate(
        [(1, 0), (1, 10), (1, 41), (1, 70.5), (1, 101.001),
         (2, 5), (2, 5.0001), (2, 2000), (3, 0)]
    )]
    df = spark.createDataFrame(
        _mk_events(spec), "event_id long, user_id long, ts timestamp"
    )
    native = {
        (r.user_id, r.session_start): (r.n_events, r.duration_sec)
        for r in streaming_session_stats(df, gap="30 minutes").collect()
    }
    batch = {
        (r.user_id, r.session_start): (r.n_events, r.duration_sec)
        for r in session_stats(df, gap_seconds=1800.0).collect()
    }
    assert native == batch


def test_streaming_session_stats_stream(spark, tmp_path):
    # watermark passage closes sessions: two files, the second's late event
    # ts advances the watermark far enough to finalize user 1's first session
    import datetime as dt

    from pyspark_validator.streaming import streaming_session_stats

    src = tmp_path / "sess_src"
    src.mkdir()
    base = dt.datetime(2026, 1, 1)
    rows0 = [(0, 1, base), (1, 1, base + dt.timedelta(minutes=5))]
    rows1 = [(2, 1, base + dt.timedelta(hours=6))]
    for i, rows in enumerate((rows0, rows1)):
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp"
        ).coalesce(1).write.parquet(str(src / f"b{i}.parquet"))
    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = streaming_session_stats(stream, gap="30 minutes", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.n_events, r.duration_sec)
        for r in spark.sql("select * from sess_stream").collect()
    }
    # the first session (2 events, 300s) is closed by the 6h-later event;
    # the last session stays open (no later watermark) and is NOT emitted
    assert (1, 2, 300.0) in got
    assert all(n <= 2 for _, n, _ in got)
