"""Incremental ingest via Structured Streaming.

The reference's incremental story is batch CDC keyed on last_edited_time
(notion_provider.py:315-319; neo4j_manager.py:183-186). Here the same
semantics run continuously: a file-source stream of document batches →
triple extraction → ``foreachBatch`` MERGE into the edges snapshot
(idempotent: distinct on the MERGE key, union with the existing snapshot,
last-writer-wins on nodes). Exactly-once comes from the streaming
checkpoint + the idempotent merge, mirroring Iceberg MERGE in production.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledge_nexus_spark.functions.extract import extract_triples_native
from knowledge_nexus_spark.operators.graphops import content_docs
from knowledge_nexus_spark.schema import DOCUMENTS_SCHEMA


def merge_edges_batch(batch_df: DataFrame, epoch_id: int, edges_path: str) -> None:
    """foreachBatch sink: extract batch triples, MERGE-distinct into the
    running edges snapshot."""
    spark = batch_df.sparkSession
    new_edges = (
        extract_triples_native(content_docs(batch_df))
        .withColumn("context", F.coalesce(F.col("context"), F.lit("")))
        .dropDuplicates(["subj", "pred", "obj", "context"])
    )
    if os.path.exists(os.path.join(edges_path, "_SUCCESS")):
        existing = spark.read.parquet(edges_path)
        merged = existing.unionByName(new_edges).dropDuplicates(
            ["subj", "pred", "obj", "context"]
        )
    else:
        merged = new_edges
    # write-then-swap for idempotency under retries
    tmp = edges_path + f"_epoch{epoch_id}"
    merged.write.mode("overwrite").parquet(tmp)
    out = spark.read.parquet(tmp)
    out.write.mode("overwrite").parquet(edges_path)


def incremental_ingest(
    spark: SparkSession,
    input_dir: str,
    edges_path: str,
    checkpoint_dir: str,
    process_all: bool = True,
):
    """Stream document parquet drops from ``input_dir`` into the edges
    snapshot. With ``process_all`` the call drains everything currently
    available and stops (the hermetic test mode); otherwise returns the
    running StreamingQuery."""
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, eid: merge_edges_batch(df, eid, edges_path)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if process_all:
        q.awaitTermination()
        return None
    return q
