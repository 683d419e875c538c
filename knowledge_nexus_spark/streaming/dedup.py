"""Streaming ingestion dedup — the streaming arm of the batch admission
gate (plans/driver_queries.q_dedup_incremental): drop records whose
dedup key was already seen within the watermark horizon.

The reference has no streaming at all (its incremental path is batch CDC,
/root/reference/graph_rag/data_source/notion_provider.py:315-319); this is
part of the engine's event-pipeline extension surface.

Shape notes (the idiomatic Spark form):
- ``dropDuplicatesWithinWatermark`` keeps the FIRST record per key and
  expires each key's state once the watermark passes it — state is
  O(distinct keys inside the horizon), not O(stream). A plain
  ``dropDuplicates`` on a stream retains every key forever unless the
  event-time column itself is part of the key, which is a different
  semantic (exact-timestamp dupes only);
- the dedup key is typically a content fingerprint (md5 of the payload),
  so state rows are ~32 bytes regardless of record size — at 100 TB/day
  the state store holds hashes, never documents.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """First-wins dedup on ``key_cols`` with per-key state expiring one
    watermark interval after the key was last admitted.

    On a batch DataFrame the same call site degrades to keep-one-per-key
    (Spark REJECTS ``dropDuplicatesWithinWatermark`` on batch input — it
    is streaming-only; verified on PySpark 4.1.2). Batch has no arrival
    order, so "first" is re-anchored to event time: the survivor is the
    min over (ts, remaining columns) — an order-insensitive argmin, never
    ``dropDuplicates``, whose survivor is partition-order dependent and
    would make re-runs of the same batch disagree under different
    AQE/partitioning decisions (same rule as multimodal.media_graph)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not df.isStreaming:
        rest = [c for c in df.columns if c not in key_cols]
        if not rest:
            # every column is a key: duplicates are identical rows, so
            # dropDuplicates is deterministic here
            return df.dropDuplicates(list(key_cols))
        # ts first in the struct: event-time-first wins; the remaining
        # columns are a total-order tiebreak for exact-ts duplicates.
        ordered = sorted(rest, key=lambda c: (c != ts_col, c))
        picked = df.groupBy(*[F.col(k) for k in key_cols]).agg(
            F.min(F.struct(*[F.col(c) for c in ordered])).alias("_row")
        )
        return picked.select(
            *key_cols, *[F.col(f"_row.{c}").alias(c) for c in rest]
        ).select(*df.columns)
    # Watermarks only accept TIMESTAMP; parquet sources often carry
    # TIMESTAMP_NTZ.
    d = df.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
        ts_col, watermark
    )
    return d.dropDuplicatesWithinWatermark(list(key_cols))


def stream_dedup_fingerprint(
    df: DataFrame,
    payload_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    fingerprint_col: str = "fp",
) -> DataFrame:
    """Content-fingerprint variant: admit the first record per
    md5(payload) seen within the watermark horizon. The fingerprint
    column stays in the output so downstream sinks can MERGE on it."""
    return stream_dedup(
        df.withColumn(fingerprint_col, F.md5(F.col(payload_col))),
        [fingerprint_col],
        ts_col=ts_col,
        watermark=watermark,
    )
