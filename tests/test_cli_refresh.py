"""CLI surface of the incremental refresh (VERDICT r3 #8): the
spark-submit entry point (scripts/run_pipeline.py --refresh-state
--with-chunks) must re-extract exactly the K touched docs and leave the
chunk state equal to a full rebuild — same contract the library tests pin
(test_refresh.py), exercised through the driver-facing process boundary."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

from knowledge_nexus_spark.datagen import CorpusConfig, generate_documents

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "scripts", "run_pipeline.py")


def _run_cli(*args: str) -> dict:
    proc = subprocess.run(
        [sys.executable, CLI, *args, "--master", "local[4]"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"CLI failed:\n{proc.stdout}\n{proc.stderr}"
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON summary in CLI stdout:\n{proc.stdout}"
    return json.loads(lines[-1])


def test_cli_refresh_rechunks_only_changed(spark, tmp_path):
    state = str(tmp_path / "state")
    v1_dir = str(tmp_path / "docs_v1")
    v2_dir = str(tmp_path / "docs_v2")

    docs_v1 = generate_documents(spark, CorpusConfig(n_docs=60, seed=21))
    docs_v1.write.parquet(v1_dir)
    n_docs = docs_v1.select("doc_id").distinct().count()

    # initial load in-process (library path, already pinned by test_refresh);
    # the CLI boundary is exercised on the incremental run below, which is
    # the contract this test adds — one subprocess JVM instead of two.
    from knowledge_nexus_spark.operators.refresh import refresh_updated
    from knowledge_nexus_spark.pipeline import PipelineConfig

    r1 = refresh_updated(
        spark, spark.read.parquet(v1_dir), state, PipelineConfig(with_chunks=True)
    )
    assert r1.n_changed == n_docs and r1.chunks is not None

    k = 3
    touched = [
        r.doc_id
        for r in docs_v1.filter(~F.col("archived") & ~F.col("in_trash"))
        .select("doc_id").distinct().orderBy("doc_id").limit(k).collect()
    ]
    updated = (
        docs_v1.filter(F.col("doc_id").isin(touched))
        .dropDuplicates(["doc_id"])
        .withColumn("last_edited_time", F.lit("2033-01-01T00:00:00.000001Z"))
        .withColumn("title", F.concat(F.col("title"), F.lit(" v2")))
    )
    docs_v1.unionByName(updated).write.parquet(v2_dir)

    s2 = _run_cli("--input", v2_dir, "--refresh-state", state, "--with-chunks")
    assert s2["reextracted_docs"] == k, f"expected {k} re-extracted: {s2}"

    # merged chunk state == full rebuild of the v2 corpus
    from knowledge_nexus_spark.operators.chunking import chunk_and_embed
    from knowledge_nexus_spark.pipeline import PipelineConfig, build_graph

    cfg = PipelineConfig(with_chunks=True)
    full = build_graph(spark, spark.read.parquet(v2_dir), cfg)
    want = chunk_and_embed(
        full.nodes, cfg.chunk_size, cfg.chunk_overlap, cfg.embedding_dim
    )

    def chunk_set(df):
        return {
            (r.page_id, r.sequence, r.content,
             tuple(round(float(x), 6) for x in r.embedding))
            for r in df.select("page_id", "sequence", "content", "embedding").collect()
        }

    got = chunk_set(spark.read.parquet(f"{state}/chunks"))
    assert got == chunk_set(want)
    assert any("v2" in c for (_p, _s, c, _e) in got)
