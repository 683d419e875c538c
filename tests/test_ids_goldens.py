"""Pure-function goldens ported from the reference's unit suite
(tests/test_data_sources/notion_processor_test.py:31-83) as column
expressions, plus checkpoint version/TTL gates
(tests/test_cache_util/test_cache_util.py:59-93)."""

import json
import os

from pyspark.sql import functions as F

from knowledge_nexus_spark.functions.ids import (
    extract_notion_uuid,
    markdown_plain_text,
    normalize_uuid,
    title_coalesce,
)

UUID_DASHED = "bf98f999-c90a-41e1-98f9-99c90a01e1d2"
UUID_FLAT = "bf98f999c90a41e198f999c90a01e1d2"


def _one(spark, col_expr, value):
    return spark.createDataFrame([(value,)], ["v"]).select(col_expr.alias("r")).first().r


def test_extract_notion_uuid_goldens(spark):
    cases = {
        f"https://www.notion.so/username/Some-Page-{UUID_DASHED}": UUID_FLAT,
        f"https://www.notion.so/{UUID_FLAT}": UUID_FLAT,
        f"https://www.notion.so/Page-{UUID_DASHED}?pvs=4": UUID_FLAT,
        f"/{UUID_DASHED}": UUID_FLAT,
        "https://example.com/not-notion": None,
        "plain text": None,
    }
    for href, want in cases.items():
        assert _one(spark, extract_notion_uuid(F.col("v")), href) == want, href


def test_normalize_uuid_goldens(spark):
    assert _one(spark, normalize_uuid(F.col("v")), UUID_DASHED) == UUID_FLAT
    assert _one(spark, normalize_uuid(F.col("v")), UUID_FLAT) == UUID_FLAT
    assert _one(spark, normalize_uuid(F.col("v")), "not-a-uuid") == "not-a-uuid"
    assert _one(spark, normalize_uuid(F.col("v")), "https://x.com/p") == "https://x.com/p"


def test_markdown_plain_text(spark):
    got = _one(spark, markdown_plain_text(F.col("v")), "see [a b](http://x) and [c](/d)")
    assert got == "see a b and c"


def test_title_coalesce(spark):
    schema = (
        "title string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    rows = [
        ("Page Title", [("prop_title", "Prop Title", None, 0)]),
        ("", [("prop_title", "Prop Title", None, 0)]),
        ("", [("paragraph", "x", None, 0)]),
        (None, []),
    ]
    df = spark.createDataFrame(rows, schema)
    got = [r.t for r in df.select(title_coalesce(F.col("title"), F.col("spans")).alias("t")).collect()]
    assert got == ["Page Title", "Prop Title", "Untitled", "Untitled"]


def test_checkpoint_version_and_ttl_gates(spark, tmp_path):
    from knowledge_nexus_spark.storage import checkpoint as cp

    ck = cp.StageCheckpointer(spark, str(tmp_path))
    df = spark.range(5)
    ck.save("s", df)
    assert ck.is_committed("s")

    # version mismatch → stage must recompute (cacheable.py:29-31 semantics)
    meta_path = os.path.join(str(tmp_path), "s", cp.META_FILE)
    meta = json.load(open(meta_path))
    meta["format_version"] = cp.FORMAT_VERSION + 1
    json.dump(meta, open(meta_path, "w"))
    assert not ck.is_committed("s")

    # TTL expiry → recompute (cache_util.py:91-93 semantics)
    meta["format_version"] = cp.FORMAT_VERSION
    meta["committed_at_epoch"] = 1.0  # long ago
    json.dump(meta, open(meta_path, "w"))
    assert cp.StageCheckpointer(spark, str(tmp_path), ttl_seconds=3600).is_committed("s") is False
    assert cp.StageCheckpointer(spark, str(tmp_path)).is_committed("s") is True
