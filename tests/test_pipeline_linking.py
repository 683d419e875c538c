"""run_pipeline with entity linking + canonicalization enabled (stages 4-5):
LINKS_TO edges appear, alias classes rewrite triples, graph stays closed."""

from pyspark.sql import functions as F

from knowledge_nexus_spark.datagen import CorpusConfig, generate_documents
from knowledge_nexus_spark.pipeline import PipelineConfig, run_pipeline

CFG = CorpusConfig(n_docs=60, seed=31)


def test_linking_and_canonicalize_stages(spark, tmp_path):
    docs = generate_documents(spark, CFG)
    ck, nodes, edges, chunks = run_pipeline(
        spark,
        docs,
        str(tmp_path),
        PipelineConfig(
            with_chunks=False,
            with_linking=True,
            canonicalize=True,
            link_min_cosine=0.4,
        ),
    )
    preds = {r.pred for r in edges.select("pred").distinct().collect()}
    assert "LINKS_TO" in preds, "linking stage must emit LINKS_TO edges"
    assert {"CONTAINS", "REFERENCES"} <= preds

    # links stage committed + metrics recorded
    assert ck.is_committed("s5_links")
    links = ck.load("s5_links")
    assert links.count() > 0
    # every link's entity must be a node
    n_ids = {r.id for r in nodes.select("id").collect()}
    for r in links.select("entity_id").distinct().collect():
        assert r.entity_id in n_ids

    # canonicalization keeps the edge set closed over the node set for
    # non-LINKS_TO predicates (orphan policy ran after the rewrite)
    core = edges.filter(F.col("pred").isin("CONTAINS", "REFERENCES"))
    bad = core.filter(
        ~F.col("subj").isin(list(n_ids)) | ~F.col("obj").isin(list(n_ids))
    )
    assert bad.count() == 0


def test_canonicalize_preserves_edges(spark, tmp_path):
    """Closure alone is trivially satisfied by silent deletion; the rewrite
    must actually PRESERVE the edge set: canonicalized core edges equal the
    un-canonicalized core edges mapped through the same canonical map."""
    from knowledge_nexus_spark.operators.components import canonical_map, rewrite_triples

    docs = generate_documents(spark, CFG)
    base_cfg = dict(with_chunks=False, with_linking=True, link_min_cosine=0.4)
    _, nodes_off, edges_off, _ = run_pipeline(
        spark, docs, str(tmp_path / "off"), PipelineConfig(canonicalize=False, **base_cfg)
    )
    ck, nodes_on, edges_on, _ = run_pipeline(
        spark, docs, str(tmp_path / "on"), PipelineConfig(canonicalize=True, **base_cfg)
    )

    cfg_on = PipelineConfig(canonicalize=True, **base_cfg)
    links = ck.load("s5_links")
    alias = links.filter(F.col("cosine") >= cfg_on.alias_min_cosine).select(
        F.col("mention").alias("src"), F.col("entity_id").alias("dst")
    )
    mapping = canonical_map(alias, nodes_on.select("id"))

    core = ["CONTAINS", "REFERENCES"]
    got = {
        (r.subj, r.pred, r.obj)
        for r in edges_on.filter(F.col("pred").isin(core)).collect()
    }
    want = {
        (r.subj, r.pred, r.obj)
        for r in rewrite_triples(
            edges_off.filter(F.col("pred").isin(core)), mapping
        ).collect()
    }
    assert got == want and len(got) > 0
