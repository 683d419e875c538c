"""Incremental ingest via Structured Streaming.

The reference's incremental story is batch CDC keyed on last_edited_time
(notion_provider.py:315-319; neo4j_manager.py:183-186). Here the same
semantics run continuously: a file-source stream of document batches →
freshness dedup within the batch → stored-watermark admission (a
per-subject last_edited_time sidecar rejects out-of-order OLDER document
versions, refresh.py's strictly-newer CDC guard carried across batches)
→ triple extraction → ``foreachBatch``
MERGE into the edges snapshot as a keyed DELETE+INSERT: every triple's
subj is its source document's normalized id (extract.py:345), so deleting
the batch documents' subj keys and inserting their re-extracted triples
is exact last-writer-wins — a re-edited document's REMOVED links (and an
archived document's whole content) leave the snapshot, matching
operators/refresh.py's batch semantics. Exactly-once comes from the
streaming checkpoint + the idempotent merge, mirroring Iceberg MERGE in
production.

Scale design — the MERGE is PARTITION-SCOPED: the snapshot is hash-
partitioned on ``bucket = pmod(xxhash64(subj), N)`` and each micro-batch
reads and rewrites ONLY the partitions its own subjects touch (dynamic
partition overwrite). Work per batch is O(batch ∪ touched partitions),
not O(total snapshot), so the stream never falls behind its own history —
the parquet emulation of an Iceberg MERGE INTO's file-level pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledge_nexus_spark.functions.extract import extract_triples_native
from knowledge_nexus_spark.operators.graphops import content_docs
from knowledge_nexus_spark.schema import DOCUMENTS_SCHEMA

N_BUCKETS = 64
_MERGE_KEY = ["subj", "pred", "obj", "context"]


def _meta_path(edges_path: str) -> str:
    """Sidecar per-subject freshness watermark (subj, last_edited_time),
    bucket-partitioned with the SAME hash as the edges snapshot so both
    prune together. This is what makes the MERGE safe under out-of-order
    delivery: refresh.py guards with a stored-watermark comparison
    (refresh.py:238-247) and the streaming path must too, or a late batch
    carrying an OLDER version of a document would delete the newer
    edges and re-insert stale ones."""
    return edges_path.rstrip("/") + "_meta"


def _bucket_of(col):
    return F.pmod(F.xxhash64(col), F.lit(N_BUCKETS)).cast("int")


def _hadoop_exists(spark: SparkSession, path: str) -> bool:
    """Existence via the Hadoop FS API — correct on any scheme (s3a, hdfs,
    file), unlike os.path.exists which only sees the local filesystem."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def _snapshot_exists(spark: SparkSession, path: str) -> bool:
    """The dynamic-partition-overwrite committer writes NO root _SUCCESS
    marker — a snapshot exists iff the root holds bucket partition dirs."""
    jvm = spark.sparkContext._jvm
    jroot = jvm.org.apache.hadoop.fs.Path(path)
    fs = jroot.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(jroot):
        return False
    glob = fs.globStatus(jvm.org.apache.hadoop.fs.Path(path + "/bucket=*"))
    return glob is not None and len(glob) > 0


def merge_edges_batch(batch_df: DataFrame, epoch_id: int, edges_path: str) -> None:
    """foreachBatch sink: freshness-dedup the batch, re-extract, and MERGE
    into the running edges snapshot as a keyed delete+insert, touching only
    the partitions the batch's documents hash to.

    Last-writer-wins, exactly like operators/refresh.py: the delete key set
    is EVERY batch document's normalized id (not just documents that still
    emit triples — a v2 that dropped its links, or was archived, must
    delete v1's edges), and two versions of one document inside a single
    micro-batch collapse to the newest before extraction.

    Out-of-order-safe: a per-subject watermark sidecar (``_meta_path``)
    stores each document's last applied ``last_edited_time``; batch rows
    not newer-or-equal than the stored watermark are REJECTED before the
    delete key set is built, so a late/backfilled batch carrying an older
    version can never regress the snapshot — the streaming equivalent of
    refresh.py's strictly-newer CDC filter.

    Idempotent under retries: the merged content of a partition is a pure
    function of (snapshot partition, meta partition, batch) — admission is
    ``>=`` the stored watermark, so replaying the last batch re-admits the
    same rows and the anti-join + re-insert rewrites identical bytes; no
    epoch-suffixed staging dirs to leak."""
    from knowledge_nexus_spark.functions.extract import normalize_uuid_col
    from knowledge_nexus_spark.operators.graphops import freshness_dedup

    spark = batch_df.sparkSession
    meta_path = _meta_path(edges_path)
    latest = freshness_dedup(batch_df).withColumn(
        "subj", normalize_uuid_col(F.col("doc_id"))
    ).withColumn("bucket", _bucket_of(F.col("subj")))

    if _snapshot_exists(spark, meta_path):
        cand_buckets = [
            r.bucket for r in latest.select("bucket").distinct().collect()
        ]
        if not cand_buckets:
            return
        stored_meta = (
            spark.read.parquet(meta_path)
            .filter(F.col("bucket").isin(cand_buckets))  # partition-pruned
            .select("subj", F.col("last_edited_time").alias("_stored_ts"))
        )
        latest = (
            latest.join(stored_meta, "subj", "left")
            .filter(
                F.col("_stored_ts").isNull()
                | (F.col("last_edited_time") >= F.col("_stored_ts"))
            )
            .drop("_stored_ts")
        )

    latest = latest.localCheckpoint(eager=True)
    subjects = latest.select("subj", "bucket").distinct()
    touched = [r.bucket for r in subjects.select("bucket").distinct().collect()]
    if not touched:
        return
    new_edges = (
        extract_triples_native(content_docs(latest.drop("subj", "bucket")))
        .withColumn("context", F.coalesce(F.col("context"), F.lit("")))
        .dropDuplicates(_MERGE_KEY)
        .withColumn("bucket", _bucket_of(F.col("subj")))
        .localCheckpoint(eager=True)
    )

    if _snapshot_exists(spark, edges_path):
        existing = (
            spark.read.parquet(edges_path)
            .filter(F.col("bucket").isin(touched))  # partition-pruned scan
            .select(*_MERGE_KEY, "bucket")
        )
        kept = existing.join(subjects.select("subj"), "subj", "left_anti")
        merged = kept.unionByName(new_edges).dropDuplicates(_MERGE_KEY)
    else:
        merged = new_edges
    # Break the read→overwrite cycle on the snapshot files, then rewrite
    # ONLY the partitions present in `merged` (the touched buckets).
    merged = merged.localCheckpoint(eager=True)
    out_buckets = {r.bucket for r in merged.select("bucket").distinct().collect()}
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("bucket").parquet(edges_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # Dynamic overwrite only rewrites partitions PRESENT in the output: a
    # touched bucket whose content was entirely deleted (every stored subj
    # re-keyed away, no new edges hashing there) must be removed explicitly
    # or its stale files survive — same emptied-bucket rule as
    # operators/refresh.py's _merge_bucketed.
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    for b in set(touched) - out_buckets:
        p = jvm.org.apache.hadoop.fs.Path(f"{edges_path}/bucket={b}")
        fs = p.getFileSystem(conf)
        if fs.exists(p):
            fs.delete(p, True)

    # Advance the per-subject watermark sidecar for the admitted docs —
    # same touched-partitions-only rewrite as the edges themselves. A
    # touched meta bucket is never emptied (every admitted subj writes a
    # meta row into its own bucket), so no emptied-bucket sweep here.
    new_meta = latest.groupBy("subj", "bucket").agg(
        F.max("last_edited_time").alias("last_edited_time")
    )
    if _snapshot_exists(spark, meta_path):
        kept_meta = (
            spark.read.parquet(meta_path)
            .filter(F.col("bucket").isin(touched))
            .select("subj", "last_edited_time", "bucket")
            .join(subjects.select("subj"), "subj", "left_anti")
        )
        new_meta = kept_meta.unionByName(
            new_meta.select("subj", "last_edited_time", "bucket")
        )
    new_meta = new_meta.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        new_meta.write.mode("overwrite").partitionBy("bucket").parquet(meta_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


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
