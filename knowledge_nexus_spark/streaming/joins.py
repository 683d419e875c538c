"""Stream-stream interval join (Structured Streaming's watermarked
two-sided join) — the streaming counterpart of operators/temporal.range_join.

The reference has no streaming at all (its incremental path is batch CDC,
/root/reference/graph_rag/data_source/notion_provider.py:315-319); this is
part of the engine's event-pipeline extension surface.

Shape notes (the idiomatic Spark form):
- both sides carry a watermark; the join condition is key equality PLUS a
  bounded time interval, which lets Spark expire per-key join state as the
  watermark advances — state is O(events inside the watermark horizon),
  not O(stream);
- works identically on batch DataFrames (the watermark is a no-op there),
  so one definition serves both paths and the batch oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = 0.0,
    upper_seconds: float = 0.0,
    watermark: str = "2 hours",
) -> DataFrame:
    """Rows (l, r) with equal ``on`` key and ``r.ts - l.ts`` within
    [lower_seconds, upper_seconds]. Right columns come back prefixed
    ``r_``. The watermark bounds both sides' join state retention."""
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")

    # Watermarks only accept TIMESTAMP; parquet sources often carry
    # TIMESTAMP_NTZ. The cast is session-tz-dependent in general but the
    # join condition uses only differences, which are tz-invariant.
    l = left.withColumn(left_ts, F.col(left_ts).cast("timestamp")).withWatermark(
        left_ts, watermark
    )
    r = right.withColumn(right_ts, F.col(right_ts).cast("timestamp")).withWatermark(
        right_ts, watermark
    )
    r = r.select(
        F.col(on).alias("_rk"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != on],
    )

    # The range bound must be expressed as raw timestamp comparisons with
    # interval literals (r_ts >= ts + INTERVAL ... SECOND): Spark's
    # StreamingJoinHelper can only solve THAT shape for state-eviction
    # predicates. unix_micros() arithmetic joins correctly but leaves
    # "state cleanup [ left = null, right = null ]" — unbounded state on a
    # continuous stream. Interval literals are µs-precision, so the
    # boundaries stay exactly equal to the batch range_join's integer-µs
    # semantics (pinned by test_stream_interval_join_matches_batch).
    rts = F.col(f"r_{right_ts}")
    lts = F.col(left_ts)
    cond = (
        (F.col(on) == F.col("_rk"))
        & (rts >= lts + F.expr(f"INTERVAL '{lower_seconds:.6f}' SECOND"))
        & (rts <= lts + F.expr(f"INTERVAL '{upper_seconds:.6f}' SECOND"))
    )
    return l.join(r, cond, "inner").drop("_rk")
