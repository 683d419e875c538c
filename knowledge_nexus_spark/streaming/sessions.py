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

        # Order-insensitive fold. The batch is sorted, but the OPEN-session
        # state may be newer than a late event the watermark legitimately
        # admits — `last` must never regress (it feeds the gap test AND the
        # timeout), so late events merge via min(start)/max(last). Gap
        # semantics are session_window's: >= gap opens a new session.
        closed = []
        for t in ts:
            t = float(t)
            if start is None:
                start, last, n = t, t, 1
            elif t >= last:
                if (t - last) >= gap:
                    closed.append((start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
            elif t >= start:
                n += 1  # late event interior to the open session
            elif (start - t) < gap:
                start, n = t, n + 1  # late event extends the session backward
            else:
                # Predates the open session by >= gap: belongs to an older
                # (possibly already-emitted) session — emit standalone.
                closed.append((t, t, 1))

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
