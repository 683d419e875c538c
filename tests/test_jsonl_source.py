"""JSONL connector: explicit-schema parse, corrupt-record quarantine, and
a pipeline smoke through the span adapter."""

from __future__ import annotations

from knowledge_nexus_spark.pipeline import PipelineConfig, build_graph
from knowledge_nexus_spark.sources.flat_text import flat_docs_to_span_docs
from knowledge_nexus_spark.sources.jsonl import read_jsonl_docs

GOOD = [
    '{"doc_id": 0, "text": "spark table join", "lang": "en", "source": "web"}',
    '{"doc_id": 1, "text": "query merge stream", "lang": "en", "source": "web"}',
    '{"doc_id": 2, "text": "table scan", "lang": "de", "source": "crawl"}',
]
BAD = [
    '{"doc_id": 3, "text": "unterminated',
    "not json at all",
]


def _write(tmp_path, lines):
    p = tmp_path / "drop.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_clean_and_quarantine_split(spark, tmp_path):
    path = _write(tmp_path, GOOD[:2] + BAD[:1] + GOOD[2:] + BAD[1:])
    clean, quarantine = read_jsonl_docs(spark, path)
    rows = {r.doc_id: r for r in clean.collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[2].lang == "de" and rows[0].text == "spark table join"
    raw = {r.raw for r in quarantine.collect()}
    assert raw == set(BAD)


def test_blank_and_null_lines_are_quarantined(spark, tmp_path):
    """from_json returns a NULL struct (no corrupt marker) for blank /
    whitespace-only / literal-null lines; they must land in quarantine,
    never as all-null clean rows (code-review finding, round 4)."""
    path = _write(tmp_path, [GOOD[0], "", "   ", "null", GOOD[1]])
    clean, quarantine = read_jsonl_docs(spark, path)
    rows = {r.doc_id for r in clean.collect()}
    assert rows == {0, 1}
    assert clean.filter("doc_id IS NULL").count() == 0
    assert quarantine.count() == 3


def test_clean_schema_is_pruned(spark, tmp_path):
    path = _write(tmp_path, GOOD)
    clean, _ = read_jsonl_docs(spark, path)
    assert clean.columns == ["doc_id", "text", "lang", "source"]


def test_jsonl_feeds_the_pipeline(spark, tmp_path):
    path = _write(tmp_path, GOOD)
    clean, _ = read_jsonl_docs(spark, path)
    res = build_graph(
        spark, flat_docs_to_span_docs(clean), PipelineConfig(render_content=False)
    )
    assert res.edges.count() > 0 and res.nodes.count() == 3
