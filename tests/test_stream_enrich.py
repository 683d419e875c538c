"""Stream-static enrichment join: streaming result == batch join on the
same data, the executed micro-batch plan broadcasts the static side, and
the query is STATELESS (no state store operators) — the property that
makes stream-static enrichment safe on an unbounded stream."""

from __future__ import annotations

import pytest

from knowledge_nexus_spark.streaming.enrich import enrich_stream, enriched_events

SF = "/root/testdata/sf0.001"


def _rows(df):
    return {
        (r.event_id, str(r.ts), r.user_id, r.event_type, r.value, r.segment,
         r.nationkey)
        for r in df.collect()
    }


def _run_stream(spark, tmp_path, build):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    src, out_dir, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        build(stream, cust)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q, spark.read.parquet(out_dir), ev, cust


def test_stream_enrich_matches_batch_and_is_stateless(spark, tmp_path):
    q, got_df, ev, cust = _run_stream(spark, tmp_path, enriched_events)
    got = _rows(got_df)
    want = _rows(enriched_events(ev, cust))
    assert got == want and got

    # both branches exercised: matched customers AND anonymous misses
    segs = {r[5] for r in got}
    assert "unknown" in segs and len(segs) > 1

    # stateless: stream-static joins keep NO state store
    ops = (q.lastProgress or {}).get("stateOperators", [])
    assert ops == [], f"stream-static join must be stateless, got {ops}"


def test_stream_enrich_broadcasts_static_side(spark, tmp_path):
    q, _, _, _ = _run_stream(spark, tmp_path, enriched_events)
    # explainInternal returns the executed micro-batch plan as a string
    # (q.explain() prints this same text)
    jplan = q._jsq.explainInternal(False)
    assert "BroadcastHashJoin" in jplan, jplan[:2000]
    assert "StateStore" not in jplan, "unexpected stateful operator"


def test_enrich_stream_rejects_stateful_outer_forms(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    with pytest.raises(ValueError):
        enrich_stream(ev, cust, on="user_id", how="right_outer")
