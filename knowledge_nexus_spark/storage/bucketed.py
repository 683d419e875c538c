"""Bucketed (co-located) table layout — the shuffle-free join path.

The reference has no storage layout at all (per-row Cypher MERGE into
Neo4j, graph_rag/storage/neo4j_manager.py:172-238); at 100 TB the
dominant cost of every fact-fact join is the shuffle of both sides. The
Spark answer is bucketing: write both tables `bucketBy(B, key)` once,
and every subsequent equi-join or aggregation on that key reads
co-located buckets — Catalyst drops the Exchange on BOTH sides
(pinned by test_plan_shapes.test_bucketed_join_has_no_exchange).

Rules of thumb encoded here:
  - bucket counts must match (or divide) across tables meant to be
    joined — default B=16 everywhere in this repo;
  - sortBy(key) pre-sorts inside buckets; Spark still plans a defensive
    local Sort below the SortMergeJoin (it only trusts sortBy when it
    can prove one file per bucket at read time), but that Sort is
    per-bucket CPU over 1/B of the data — the Exchange elimination is
    the part that matters at 100 TB, and it always holds;
  - bucket pruning applies to point predicates on the bucket key, so a
    keyed lookup reads 1/B of the data with zero index structures.

Bucketed tables require the session catalog (`saveAsTable`) — plain
`.parquet(path)` writes cannot record bucket metadata. Production
equivalent: Iceberg's `bucket(B, key)` partition transform +
storage-partitioned joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a bucketed+sorted catalog table on ``key``.

    The repartition onto the bucket hash makes each writer task own
    exactly one bucket → ONE file per bucket. That is what lets the
    reader trust the sortBy metadata: with multiple files per bucket
    Spark must re-Sort below every SortMergeJoin anyway, silently
    keeping the cost the layout was supposed to remove."""
    df = df.repartition(buckets, key)
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — no Exchange on
    either side when the bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
