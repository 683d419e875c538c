"""Batch MERGE sinks — the Iceberg MERGE INTO emulation (S9-S11, J3).

Reference semantics being reproduced:
  - node upsert: MERGE by id, update only when the incoming
    last_edited_time differs/newer (neo4j_manager.py:172-206, J3)
  - chunk sink: delete the page's old chunks, insert the new set with
    sequence numbers (partition overwrite keyed by page_id,
    neo4j_manager.py:208-228, S10)
  - edge merge: distinct on (subj, pred, obj, context)
    (neo4j_manager.py:230-238, S11)

In production these are literal `MERGE INTO` / `overwritePartitions` on
Iceberg tables; the sandbox emulation is union + window / anti-join with
the same row-level outcome, written via write-then-swap for idempotency
under retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_nodes(existing: DataFrame | None, updates: DataFrame) -> DataFrame:
    """Last-writer-wins node upsert: an update replaces a stored node only
    when strictly newer (equal timestamps keep the stored row —
    neo4j_manager.py:185 skips the write)."""
    updates = updates.withColumn("_prio", F.lit(0))
    if existing is None:
        merged = updates
    else:
        merged = existing.withColumn("_prio", F.lit(1)).unionByName(updates)
    w = Window.partitionBy("id").orderBy(
        F.to_timestamp(F.col("last_edited_time"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSX")
        .desc_nulls_last(),
        F.col("_prio").desc(),  # ties prefer the stored row
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )


def overwrite_page_chunks(existing: DataFrame | None, new_chunks: DataFrame) -> DataFrame:
    """Partition overwrite by page_id: all old chunks of updated pages are
    replaced by the new set (delete+insert, S10)."""
    if existing is None:
        return new_chunks
    updated_pages = new_chunks.select("page_id").distinct()
    kept = existing.join(updated_pages, "page_id", "left_anti")
    return kept.unionByName(new_chunks)


def destructive_reset(spark, *table_paths: str) -> int:
    """S13 — the reference's `MATCH (n) DETACH DELETE n` wipe
    (neo4j_manager.py:147-150): drop every given graph table directory.
    Hadoop FS API so it works on any scheme (file, hdfs, s3a). Returns the
    number of paths that existed and were removed. In production this is
    `DROP TABLE` / `TRUNCATE` on the Iceberg catalog."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    removed = 0
    for path in table_paths:
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(conf)
        if fs.exists(p):
            fs.delete(p, True)
            removed += 1
    return removed


def merge_edges(existing: DataFrame | None, new_edges: DataFrame) -> DataFrame:
    """Cypher-MERGE-equivalent edge upsert: distinct on the full pattern
    key incl. context (NULL stored as '')."""
    new_edges = new_edges.withColumn("context", F.coalesce(F.col("context"), F.lit("")))
    merged = new_edges if existing is None else existing.unionByName(new_edges)
    return merged.dropDuplicates(["subj", "pred", "obj", "context"])
