"""Streaming sessionization — the stateful operator companion to the
batch `events_sessionize` driver query (30-minute inactivity gap).

Two implementations, each the idiomatic Spark shape for its need:

- ``session_aggregate`` — the built-in ``session_window`` dynamic-gap
  window: one expression, identical in batch and streaming (the caller
  adds a watermark for streams). Gap semantics: a session's window ends
  ``gap`` after its last event, and a new event merges iff it starts
  STRICTLY before that end — i.e. a gap of exactly ``gap`` seconds opens
  a new session, whereas the batch window-function query
  (`q_events_sessionize`, gap > 1800) keeps it. Microsecond timestamps
  make exact-gap ties measure-zero; the equivalence test pins agreement
  on generated data.

- ``sessionize_stateful`` — ``applyInPandasWithState`` with event-time
  timeout: per-user open-session state, CLOSED sessions emitted exactly
  once when the watermark passes session_end + gap. This is the shape for
  per-session payloads a window aggregation cannot express (sequences,
  custom reducers) — the "custom stateful operator" path. Gap semantics
  match ``session_window`` exactly (a gap of EXACTLY ``gap`` seconds opens
  a new session), and state updates are order-insensitive: a late event the
  watermark legitimately admits merges via min(start)/max(last) instead of
  regressing the stored session end.

Scale: state is one tiny tuple per ACTIVE user (not per event); the
shuffle key is user_id, so a hot user is one group — sessionization is
inherently per-user-sequential, matching the reference-free batch form.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_GAP_SECONDS = 1800

_OUT_SCHEMA = (
    "user_id bigint, session_start double, session_end double, n_events bigint"
)
_STATE_SCHEMA = "start double, last double, n bigint"


def session_aggregate(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Per-session rows via the built-in session_window (batch or stream)."""
    gap = f"{gap_seconds} seconds"
    return (
        events.groupBy(
            F.session_window(F.col("ts"), gap).alias("sw"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def user_session_counts(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """(user_id, n_sessions) — the batch driver query's shape, computed
    through session_window instead of lag()."""
    return (
        session_aggregate(events, gap_seconds)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )


def _epoch_series(ts: pd.Series) -> pd.Series:
    return ts.astype("int64") / 1e9  # ns → fractional seconds


def _sessionize_fn(gap_seconds: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state):  # GroupState
        gap = float(gap_seconds)
        (user_id,) = key

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start": [start],
                 "session_end": [last], "n_events": [n]}
            )
            return

        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        ts = _epoch_series(pd.concat(parts)["ts"]).sort_values().to_numpy()

        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0

        # Order-insensitive interval gap-merge. The open-session state is
        # just one more (start, end, n) interval among the batch's events:
        # sort them all and fold consecutive intervals whose gap is < gap
        # (session_window's >= gap opens a new session). This handles every
        # late-arrival shape a finite watermark admits — events interior to
        # the open session, backward extension CHAINS (e.g. gap 10, state
        # start 100, events 85 and 92: 92 bridges 85 into the session — a
        # per-event fold over ascending timestamps emits 85 as a spurious
        # singleton), and runs of old events that belong to ONE earlier
        # session merging with each other before being emitted. The last
        # interval stays open as the new state; earlier ones close now
        # (possibly re-emitting a session a deeper-late event reopened —
        # the documented exactly-once boundary of a finite watermark).
        items = [(float(t), float(t), 1) for t in ts]
        if start is not None:
            items.append((float(start), float(last), int(n)))
        items.sort()
        closed = []
        cs, ce, cn = items[0]
        for s2, e2, n2 in items[1:]:
            if (s2 - ce) >= gap:
                closed.append((cs, ce, cn))
                cs, ce, cn = s2, e2, n2
            else:
                ce, cn = max(ce, e2), cn + n2
        start, last, n = cs, ce, cn

        state.update((float(start), float(last), int(n)))
        # event-time timeout: fire when the watermark passes last + gap
        state.setTimeoutTimestamp(int((last + gap) * 1000) + 1)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return fn


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming DataFrame of CLOSED sessions (user_id, session_start,
    session_end, n_events — epochs as fractional seconds), emitted exactly
    once per session when the event-time watermark passes its close."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .withWatermark("ts", watermark)  # after the cast so the event-time
        # designation stays on the column the state timeout reads
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_seconds),
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
