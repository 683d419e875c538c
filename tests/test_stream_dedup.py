"""Streaming ingestion dedup: admitted key set == batch distinct, and the
executed plan is the stateful dedup-within-watermark operator (file-source
availableNow harness, as in test_stream_joins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_nexus_spark.streaming.dedup import (
    stream_dedup,
    stream_dedup_fingerprint,
)

SF = "/root/testdata/sf0.001"


def test_stream_dedup_admits_one_per_key(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    # Duplicate every record 3x so the dedup has real work.
    tripled = ev.unionByName(ev).unionByName(ev)
    src, out_dir, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    tripled.write.parquet(src)

    s = spark.readStream.schema(tripled.schema).parquet(src)
    q = (
        stream_dedup(s, ["event_id"], watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out_dir)
    want_keys = {r.event_id for r in ev.select("event_id").distinct().collect()}
    got_keys = [r.event_id for r in got.select("event_id").collect()]
    assert sorted(got_keys) == sorted(want_keys)  # one row per key, no loss


def test_stream_dedup_fingerprint_matches_batch_admission(spark, tmp_path):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .withColumn("ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    )
    src, out_dir, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    docs.write.parquet(src)

    s = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        stream_dedup_fingerprint(s, payload_col="text")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got_fps = [r.fp for r in spark.read.parquet(out_dir).select("fp").collect()]
    want_fps = {
        r.fp for r in docs.select(F.md5("text").alias("fp")).distinct().collect()
    }
    assert sorted(got_fps) == sorted(want_fps)


def test_stream_dedup_plan_is_stateful_with_watermark(spark, tmp_path):
    """The executed plan must use the dedup-WITHIN-WATERMARK stateful
    operator (keyed state expires as the watermark advances) — a plain
    StreamingDeduplicate node would retain every key forever on a
    continuous stream."""
    ev = spark.read.parquet(f"{SF}/events.parquet").limit(10).select(
        "event_id", "ts"
    )
    src, ck = (str(tmp_path / d) for d in ("src", "ck"))
    ev.write.parquet(src)
    s = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        stream_dedup(s, ["event_id"], watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_plan_probe")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.recentProgress
    assert progress, "stream produced no progress"
    op_names = [
        op.get("operatorName", "")
        for p in progress
        for op in p.get("stateOperators", [])
    ]
    assert any("dedupeWithinWatermark" in n for n in op_names), op_names


def test_stream_dedup_batch_fallback(spark):
    """stream_dedup must also accept a BATCH frame (Spark rejects
    dropDuplicatesWithinWatermark on batch input, so the call degrades
    to dropDuplicates — code-review finding, round 4)."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    tripled = ev.unionByName(ev).unionByName(ev)
    got = stream_dedup(tripled, ["event_id"], watermark="1 hour")
    assert not got.isStreaming
    assert got.count() == ev.select("event_id").distinct().count()


def test_stream_dedup_batch_fallback_is_deterministic(spark):
    """The batch fallback's survivor must be the event-time-first row
    (min over (ts, tiebreak)), independent of partitioning — a plain
    dropDuplicates keeps a partition-order-dependent row (code-review
    finding, round 4)."""
    rows = [
        ("k1", "2024-01-01 00:00:02", "late"),
        ("k1", "2024-01-01 00:00:01", "first"),
        ("k1", "2024-01-01 00:00:03", "latest"),
        ("k2", "2024-01-01 00:00:05", "only"),
        ("k3", "2024-01-01 00:00:07", "b"),  # exact-ts tie: payload breaks it
        ("k3", "2024-01-01 00:00:07", "a"),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, payload string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    want = {("k1", "first"), ("k2", "only"), ("k3", "a")}
    for parts in (1, 3, 7):
        got = {
            (r.k, r.payload)
            for r in stream_dedup(df.repartition(parts), ["k"]).collect()
        }
        assert got == want, parts
    # column order preserved
    assert stream_dedup(df, ["k"]).columns == df.columns
    # all-columns-key edge case still works
    assert stream_dedup(df, ["k", "ts", "payload"]).count() == 6
