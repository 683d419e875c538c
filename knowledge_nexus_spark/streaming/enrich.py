"""Stream-static enrichment join — attach slowly-changing dimension
attributes to a live event stream (readStream events ⋈ static dim).

The reference enriches rows one HTTP round-trip at a time while paging
the API (/root/reference/graph_rag/data_source/notion_provider.py — each
related page fetched per row); the Spark-first form is a stream-static
join, which Structured Streaming executes STATELESSLY: the static side
is (re)resolved per micro-batch and the join needs no state store at
all — no watermark bookkeeping, no eviction, nothing to grow on an
unbounded stream. That statelessness is the scale story and is pinned
in tests (``lastProgress.stateOperators == []``).

Why this shape scales:
- the dimension is broadcast when small (the common case — dims are
  MBs, streams are TBs), so each micro-batch is a map-side hash join
  with ZERO shuffle of stream rows; at 1000 executors every task joins
  locally against its broadcast copy;
- a static side too large to broadcast still works — Spark shuffles the
  micro-batch against the static table per batch — but then pre-bucket
  the dim on the join key (storage/bucketed.py) so only the stream side
  exchanges;
- because the static side is re-resolved per micro-batch, replacing the
  dim's underlying files (e.g. the freshness-MERGE snapshot produced by
  storage/merge.py) is picked up on the next batch — the cheap form of
  a slowly-changing dimension;
- left_outer keeps unmatched stream rows (stream side must be the left
  / preserved side — Spark rejects outer joins that preserve the static
  side, since an unbounded stream can never prove "no match ever").
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join a streaming DataFrame to a static dimension.

    ``how`` is restricted to the stateless stream-static forms where the
    STREAM is the preserved side: ``inner`` and ``left_outer``.
    ``broadcast_dim=True`` hints the static side for broadcast (skip for
    dims beyond spark.sql.autoBroadcastJoinThreshold-scale; bucket them
    instead)."""
    if how not in ("inner", "left_outer"):
        raise ValueError(
            f"stream-static enrichment supports inner/left_outer, got {how!r}"
        )
    dim = F.broadcast(dim_df) if broadcast_dim else dim_df
    return stream_df.join(dim, on=list([on] if isinstance(on, str) else on), how=how)


def enriched_events(stream_df: DataFrame, customer_df: DataFrame) -> DataFrame:
    """The concrete pipeline enrichment: events keyed by user_id gain the
    customer dimension's segment + nation. Suspended accounts (negative
    c_acctbal) are excluded from the dimension, so the left_outer form is
    exercised with real misses at every scale factor, segment defaulting
    to 'unknown' for unenrichable users."""
    dim = customer_df.filter(F.col("c_acctbal") >= 0).select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
    )
    out = enrich_stream(stream_df, dim, on="user_id", how="left_outer")
    return out.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F.coalesce("segment", F.lit("unknown")).alias("segment"),
        F.coalesce("nationkey", F.lit(-1)).alias("nationkey"),
    )
