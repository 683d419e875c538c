"""Watermarked tumbling-window aggregation — the canonical Structured
Streaming pattern (readStream → event-time window agg → writeStream) and
the streaming form of the batch `events_windowed` driver query.

The reference has no streaming (its incremental path is batch CDC,
/root/reference/graph_rag/data_source/notion_provider.py:315-319); this
completes the engine's streaming extension surface next to ingest CDC,
sessionization, stream-stream interval join and watermarked dedup.

Why this shape scales:
- ``F.window(ts, w)`` is a GROUPING expression, so partial aggregation
  applies — each micro-batch pre-aggregates map-side and shuffles one
  partial row per (window, key) per task, never raw events;
- the watermark bounds state: closed windows (window.end < watermark)
  are evicted from the state store every batch, so state is
  O(open windows × keys), not O(stream). Unlike interval-join
  conditions built from unix_micros() arithmetic (see streaming/joins
  round-4 fix), a window column is natively understood by the state
  eviction planner — no predicate-solving caveat;
- late rows older than the watermark are DROPPED (counted in
  numRowsDroppedByWatermark), the documented completeness/latency trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_aggregate(
    df: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window count + exact decimal sum per (window, key).

    Works identically on batch input (the watermark is a no-op there and
    the window is a plain grouping expression), so one definition serves
    both paths and the streaming result is pinned equal to batch in
    tests. Emits window_start/window_end as TIMESTAMP columns plus the
    aggregates; sum runs in DECIMAL so it is aggregation-order-free."""
    d = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if d.isStreaming:
        d = d.withWatermark(ts_col, watermark)
    return (
        d.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col(value_col).cast("decimal(28,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )
