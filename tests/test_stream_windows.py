"""Watermarked tumbling-window aggregation: streaming result == batch on
the same data (file-source availableNow harness, as in test_stream_joins),
and the executed plan must be a genuinely stateful streaming aggregation
with watermark-driven state eviction."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_nexus_spark.streaming.windows import windowed_aggregate

SF = "/root/testdata/sf0.001"


def _rows(df):
    return {
        (str(r.window_start), str(r.window_end), r.event_type, r.n, r.sum_value)
        for r in df.collect()
    }


def test_stream_windowed_agg_matches_batch(spark, tmp_path):
    """Append mode only emits a window once the watermark passes its end,
    so the source carries one far-future SENTINEL row that pushes the
    final watermark past every real window (the standard flush trick for
    finite-input streaming tests). The sentinel's own window stays open
    and is never emitted; the batch reference simply excludes it."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "ts", "event_type", "value"
    )
    sentinel = ev.agg(F.max("ts").alias("ts")).select(
        (F.col("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
    )
    src, out_dir, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    ev.unionByName(sentinel).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        windowed_aggregate(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = _rows(spark.read.parquet(out_dir))
    want = _rows(windowed_aggregate(ev))
    assert got == want and got, f"{len(got)} vs {len(want)} rows"


def test_stream_windowed_agg_is_stateful_with_eviction(spark, tmp_path):
    """The executed plan must contain the stateful aggregation operator
    AND an event-time watermark — the pair that makes window state
    evictable (windows close when the watermark passes window.end)."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "ts", "event_type", "value"
    )
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    ev.limit(200).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        windowed_aggregate(stream)
        .writeStream.format("noop")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # lastProgress carries the stateful-operator metrics directly
    ops = (q.lastProgress or {}).get("stateOperators", [])
    assert ops, "no stateful operator in the streaming query"
    assert any(
        o.get("operatorName", "").startswith("stateStoreSave") for o in ops
    ), ops


def test_batch_path_equals_plain_groupby(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "ts", "event_type", "value"
    )
    via_op = windowed_aggregate(ev)
    plain = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    got = {(str(r.window_start), r.event_type, r.n) for r in via_op.collect()}
    want = {(str(r.window_start), r.event_type, r.n) for r in plain.collect()}
    assert got == want
