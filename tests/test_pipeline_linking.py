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
