"""Stream-stream interval join: streaming result == batch range_join on
the same data (file-source availableNow harness, as in test_sessions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_nexus_spark.operators.temporal import range_join
from knowledge_nexus_spark.streaming.joins import stream_interval_join

SF = "/root/testdata/sf0.001"
LOWER, UPPER = -1800.0, 1800.0


def test_stream_interval_join_matches_batch(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet").filter(F.col("user_id") < 10)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )

    cdir, pdir, out_dir, ck = (
        str(tmp_path / d) for d in ("clicks", "purch", "out", "ck")
    )
    clicks.write.parquet(cdir)
    purchases.write.parquet(pdir)

    cs = spark.readStream.schema(clicks.schema).parquet(cdir)
    ps = spark.readStream.schema(purchases.schema).parquet(pdir)
    q = (
        stream_interval_join(
            cs, ps, on="user_id", lower_seconds=LOWER, upper_seconds=UPPER
        )
        .select("event_id", "user_id", "r_event_id")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.event_id, r.user_id, r.r_event_id)
        for r in spark.read.parquet(out_dir).collect()
    }

    want = {
        (r.event_id, r.user_id, r.r_event_id)
        for r in range_join(
            clicks,
            purchases.withColumnRenamed("event_id", "rid"),
            on="user_id",
            lower_seconds=LOWER,
            upper_seconds=UPPER,
        )
        .select("event_id", "user_id", F.col("r_rid").alias("r_event_id"))
        .collect()
    }
    assert got == want and len(want) > 0


def test_stream_interval_join_is_stateful_streaming_plan(spark, tmp_path):
    """The streaming plan must be a stream-stream join with watermarks on
    both sides AND derivable state-eviction predicates — watermark nodes
    alone are not enough: a condition Spark's StreamingJoinHelper cannot
    solve (e.g. unix_micros() arithmetic) executes with
    'state cleanup [ left = null, right = null ]' and join state grows
    unboundedly on a continuous stream."""
    ev = spark.read.parquet(f"{SF}/events.parquet").limit(10)
    d = str(tmp_path / "in")
    ev.write.parquet(d)
    s1 = spark.readStream.schema(ev.schema).parquet(d)
    s2 = spark.readStream.schema(ev.schema).parquet(d)
    j = stream_interval_join(
        s1.select("event_id", "user_id", "ts"),
        s2.select("user_id", "ts", "event_id"),
        on="user_id",
        lower_seconds=-60,
        upper_seconds=60,
    )
    assert j.isStreaming
    plan = j._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2

    # Execute one availableNow micro-batch and inspect the EXECUTED plan:
    # the state-cleanup predicates must be materialized, not null.
    q = (
        j.select("event_id", "r_event_id")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    executed = q._jsq.explainInternal(True)
    cleanup = [ln for ln in executed.splitlines() if "state cleanup" in ln]
    assert cleanup, "executed plan has no StreamingSymmetricHashJoin"
    assert "left = null" not in cleanup[0] and "left value predicate:" in cleanup[0]
    assert "right = null" not in cleanup[0] and "right value predicate:" in cleanup[0]


def test_stream_interval_join_state_actually_shrinks(spark, tmp_path):
    """Round-4 VERDICT #9: close the loop from plan predicate to OBSERVED
    eviction. Three waves of events 4 h apart stream through one file per
    micro-batch (watermark 2 h): the wave-1 join state must be REMOVED
    once later waves advance the watermark past it — asserted from the
    streaming progress metrics (numRowsRemoved / numRowsTotal), not the
    plan. A broken eviction predicate (the unix_micros() shape the
    operator's docstring warns about) passes the plan test's sibling
    assertions only via string matching; this one fails unless state
    rows are observed leaving the store."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    waves = [
        [(i, 1, base + dt.timedelta(hours=4 * w, seconds=i)) for i in range(20)]
        for w in range(3)
    ]
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    for w, rows in enumerate(waves):
        df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
        df.coalesce(1).write.parquet(f"{ldir}/w{w}")
        df.coalesce(1).write.parquet(f"{rdir}/w{w}")

    schema = spark.read.parquet(f"{ldir}/w0").schema
    ls = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{ldir}/*")
    )
    rs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{rdir}/*")
    )
    j = stream_interval_join(
        ls,
        rs.withColumnRenamed("event_id", "rid"),
        on="user_id",
        lower_seconds=-60,
        upper_seconds=60,
    )
    q = (
        j.select("event_id", "r_rid")
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    stats = [
        (
            p["stateOperators"][0]["numRowsTotal"],
            p["stateOperators"][0]["numRowsRemoved"],
        )
        for p in q.recentProgress
        if p.get("stateOperators")
    ]
    assert len(stats) >= 2, f"expected multiple micro-batches, got {stats}"
    removed = sum(r for _, r in stats)
    peak = max(t for t, _ in stats)
    final = stats[-1][0]
    assert removed > 0, f"no state rows were ever evicted: {stats}"
    assert final < peak, f"state never shrank: {stats}"
