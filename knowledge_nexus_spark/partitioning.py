"""Scan-parallelism guard for unsplittable inputs.

The driver's parquet corpora are written as ONE file with ONE row group
per table (verified at sf1: documents 50k rows / 1 row group, embeddings
20k / 1, events 1M / 1), and a parquet scan cannot split inside a row
group — so every scan task count is bounded by the ROW-GROUP count, not
by ``spark.sql.files.maxPartitionBytes``. Any operator that fuses heavy
per-row compute (regex tokenization, md5 shingling, Arrow UDFs) into the
scan projection therefore runs on 1 core of a 32-core executor pool.

``ensure_min_parallelism`` is the guide §2.5 "input skew: one huge
unsplittable file → repartition immediately after the read" remedy, made
SCALE-ADAPTIVE: it round-robin-repartitions to the session's default
parallelism ONLY when the source would yield fewer partitions. At
production scale (inputs with >= cores splits) the condition never fires
and the plan is untouched — this is not a local[32] constant, it is a
guard that disappears when the data layout is healthy. The explicit
partition count also keeps AQE from re-coalescing the exchange (AQE only
coalesces shuffles with no user-specified count), which matters because
AQE sizes partitions by BYTES while these stages are expensive per ROW.

Rows are redistributed round-robin (deterministic under retry: Spark
sorts before round-robin repartition, SPARK-23207), so only operators
whose results are partition-independent may use it — which is every
registry query by design (the driver value-hashes them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` to ``min_parts`` (default: the session's
    ``sc.defaultParallelism``) when its current lineage would produce
    fewer partitions; otherwise return it unchanged."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
