"""Checkpointed pipeline: chunks stage, resume-from-snapshot semantics,
per-partition lineage metrics (SURVEY.md §4.4, BASELINE.json north_star)."""

import json
import os

from knowledge_nexus_spark.datagen import CorpusConfig, generate_documents
from knowledge_nexus_spark.pipeline import PipelineConfig, run_pipeline

CFG = CorpusConfig(n_docs=60, seed=11)


def test_pipeline_end_to_end_with_chunks(spark, tmp_path):
    docs = generate_documents(spark, CFG)
    ck, nodes, edges, chunks = run_pipeline(
        spark, docs, str(tmp_path), PipelineConfig(with_chunks=True)
    )
    n_nodes, n_edges, n_chunks = nodes.count(), edges.count(), chunks.count()
    assert n_nodes > 0 and n_edges > 0 and n_chunks > 0

    # HAS_CHUNK edges present and keyed correctly
    hc = edges.filter("pred = 'HAS_CHUNK'")
    assert hc.count() == n_chunks
    sample = hc.first()
    assert sample.obj.startswith(sample.subj)

    # chunk contents carry the constant header (content_chunker_and_embedder.py:123-129)
    c = chunks.first()
    assert c.content.startswith("Title: ")
    assert len(c.embedding) == 64

    # metrics sidecars exist with per-partition lineage
    meta = json.load(open(os.path.join(str(tmp_path), "s2_triples_raw", "_STAGE_META.json")))
    assert meta["row_count"] > 0
    assert meta["partition_counts"]
    assert sum(p["rows"] for p in meta["partition_counts"]) == meta["row_count"]


def test_pipeline_resume_skips_committed_stages(spark, tmp_path):
    docs = generate_documents(spark, CFG)
    wd = str(tmp_path)
    run_pipeline(spark, docs, wd, PipelineConfig(with_chunks=False))

    # snapshot mtimes before rerun
    def mtime(stage):
        return os.path.getmtime(os.path.join(wd, stage, "_STAGE_META.json"))

    before = {s: mtime(s) for s in ("s1_documents", "s2_triples_raw", "s3_nodes", "s6_edges")}

    ck2, nodes2, edges2, _ = run_pipeline(spark, docs, wd, PipelineConfig(with_chunks=False))
    after = {s: mtime(s) for s in before}
    assert before == after, "committed stages must not recompute"
    assert all(ck2.metrics[s].get("resumed") for s in before)

    # simulate a killed run: stage 6 lost, earlier stages committed
    e_before = edges2.count()
    ck2.invalidate("s6_edges")
    ck3, _n, edges3, _ = run_pipeline(spark, docs, wd, PipelineConfig(with_chunks=False))
    assert edges3.count() == e_before
    assert ck3.metrics["s1_documents"].get("resumed")
    assert "resumed" not in ck3.metrics["s6_edges"]
