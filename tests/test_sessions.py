"""Streaming sessionization: session_window batch equivalence with the
lag()-based driver query, and the applyInPandasWithState stateful operator
emitting closed sessions exactly once."""

from pyspark.sql import functions as F

from knowledge_nexus_spark.streaming.sessions import (
    SESSION_GAP_SECONDS,
    session_aggregate,
    sessionize_stateful,
    user_session_counts,
)

SF = "/root/testdata/sf0.001"


def test_session_window_counts_match_lag_query(spark):
    """The built-in session_window aggregation and the window-function
    sessionize (driver query) agree on per-user session counts — gap
    semantics differ only at measure-zero exact-gap ties, absent from the
    microsecond-timestamped data."""
    from knowledge_nexus_spark.plans.driver_queries import q_events_sessionize

    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = {r.user_id: r.n_sessions for r in user_session_counts(ev).collect()}
    want = {r.user_id: r.n_sessions for r in q_events_sessionize(spark, SF).collect()}
    assert got == want


def test_session_aggregate_shape(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    s = session_aggregate(ev)
    rows = s.collect()
    assert all(r.session_start <= r.session_end and r.n_events >= 1 for r in rows)
    # sessions of one user never overlap (sorted, gap-separated)
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert (s2 - e1).total_seconds() >= SESSION_GAP_SECONDS


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the fold."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def _feed(fn, state, epochs):
    import pandas as pd

    pdf = pd.DataFrame({"ts": pd.to_datetime(epochs, unit="s")})
    out = list(fn((1,), iter([pdf]), state))
    return [tuple(r) for o in out for r in o.itertuples(index=False)]


def test_stateful_late_event_does_not_regress_session_end():
    """A late event the watermark admits must merge order-insensitively:
    after [100, 200] then late 150, an event at 1960 (true gap 1760 < 1800)
    must NOT close the session (the bug was last=150 → spurious close)."""
    from knowledge_nexus_spark.streaming.sessions import _sessionize_fn

    fn = _sessionize_fn(1800)
    st = _FakeState()
    assert _feed(fn, st, [100, 200]) == []
    assert _feed(fn, st, [150, 1960]) == []  # no spurious close
    assert st.get == (100.0, 1960.0, 4)


def test_stateful_late_event_extends_backward_and_old_is_standalone():
    from knowledge_nexus_spark.streaming.sessions import _sessionize_fn

    fn = _sessionize_fn(1800)
    st = _FakeState()
    assert _feed(fn, st, [10000, 10100]) == []
    # within gap before start → extends backward; ancient → standalone
    assert _feed(fn, st, [500, 9000]) == [(1, 500.0, 500.0, 1)]
    assert st.get == (9000.0, 10100.0, 3)


def test_stateful_backward_chain_merges_into_one_session():
    """Late events must BRIDGE: with gap 10 and an open session at 100, the
    batch [85, 92] chains (92 joins the session, then 85 joins via 92) —
    the old per-event ascending fold emitted 85 as a spurious singleton."""
    from knowledge_nexus_spark.streaming.sessions import _sessionize_fn

    fn = _sessionize_fn(10)
    st = _FakeState()
    assert _feed(fn, st, [100, 101]) == []
    assert _feed(fn, st, [85, 92]) == []
    assert st.get == (85.0, 101.0, 4)


def test_stateful_old_events_merge_with_each_other():
    """Two admitted events >= gap older than the open session but within
    gap of EACH OTHER close as ONE session (batch session_window parity),
    not two singletons."""
    from knowledge_nexus_spark.streaming.sessions import _sessionize_fn

    fn = _sessionize_fn(10)
    st = _FakeState()
    assert _feed(fn, st, [100, 101]) == []
    assert _feed(fn, st, [50, 55]) == [(1, 50.0, 55.0, 2)]
    assert st.get == (100.0, 101.0, 2)


def test_stateful_exact_gap_matches_session_window_semantics():
    """session_window opens a new session at EXACTLY gap seconds — the
    stateful operator must agree (>= gap, not > gap)."""
    from knowledge_nexus_spark.streaming.sessions import _sessionize_fn

    fn = _sessionize_fn(1800)
    st = _FakeState()
    assert _feed(fn, st, [0, 1800]) == [(1, 0.0, 0.0, 1)]
    assert st.get == (1800.0, 1800.0, 1)


def test_stateful_streaming_sessionize(spark, tmp_path):
    """File-source stream + sentinel drop: every real session is emitted
    exactly once and equals the batch session_aggregate result."""
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("user_id") < 8)
        .localCheckpoint(eager=True)
    )
    in_dir, out_dir, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    ev.write.mode("overwrite").parquet(in_dir)

    def run_once():
        stream = spark.readStream.schema(ev.schema).parquet(in_dir)
        q = (
            sessionize_stateful(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()

    # sentinel drop: one far-future event per user forces the previous
    # open session closed on arrival (gap >> SESSION_GAP_SECONDS)
    far = ev.groupBy("user_id").agg(F.max("ts").alias("mx")).select(
        F.lit(0).cast("long").alias("event_id"),
        (F.col("mx") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        "user_id",
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit(None).cast(ev.schema["props"].dataType).alias("props"),
    )
    far.select([f.name for f in ev.schema.fields]).write.mode("append").parquet(in_dir)
    run_once()

    # sentinel events form their own sessions; some are legitimately closed
    # by the event-time timeout (per-user sentinels span a wide range, so
    # older ones fall behind the global watermark) — exclude them from the
    # comparison, they are not part of the real corpus
    max_real = ev.agg(F.max("ts")).collect()[0][0].timestamp()
    got = {
        (r.user_id, round(r.session_start, 3), round(r.session_end, 3), r.n_events)
        for r in spark.read.parquet(out_dir).collect()
        if r.session_start <= max_real
    }
    want = {
        (
            r.user_id,
            round(r.session_start.timestamp(), 3),
            round(r.session_end.timestamp(), 3),
            r.n_events,
        )
        for r in session_aggregate(ev).collect()
    }
    assert got == want and len(got) > 0
