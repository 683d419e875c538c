"""Root-scoped traversal (G1/P15): Spark BFS vs oracle BFS parity,
depth-cap behavior, REFERENCES-follow gate."""

from knowledge_nexus_spark.datagen import CorpusConfig, generate_documents, generate_documents_local
from knowledge_nexus_spark.datagen import doc_uuid
from knowledge_nexus_spark.oracle import OracleConfig, run_oracle
from knowledge_nexus_spark.operators.traversal import reachable_docs, root_scoped_documents
from knowledge_nexus_spark.pipeline import PipelineConfig, build_graph

CFG = CorpusConfig(n_docs=100, seed=9)
ROOT = doc_uuid(0)


def _oracle(cfg_kwargs):
    return run_oracle(generate_documents_local(CFG), OracleConfig(**cfg_kwargs))


def test_reachable_set_matches_oracle(spark):
    docs = generate_documents(spark, CFG)
    got = {r.id for r in reachable_docs(docs, ROOT).collect()}
    oracle = _oracle({"root_id": ROOT})
    want = {p["id"] for p in oracle.pages.values() if p["source"] == "Notion"}
    # oracle pages include archived-gated exclusions; reachable_docs is the
    # pre-gate visited set, so every oracle Notion page must be reachable
    assert want <= got
    # hub corpus: root reaches most of the corpus
    assert len(got) > 5


def test_root_scoped_triples_match_oracle(spark):
    docs = generate_documents(spark, CFG)
    scoped = root_scoped_documents(docs, ROOT)
    res = build_graph(spark, scoped, PipelineConfig(render_content=False))
    got = {(r.subj, r.pred, r.obj) for r in res.edges.select("subj", "pred", "obj").collect()}
    want = _oracle({"root_id": ROOT}).triple_set
    assert got == want, f"missing={list(want - got)[:5]} extra={list(got - want)[:5]}"


def test_root_scoped_no_references_follow(spark):
    docs = generate_documents(spark, CFG)
    scoped = root_scoped_documents(docs, ROOT, follow_references=False)
    res = build_graph(spark, scoped, PipelineConfig(render_content=False))
    got = {(r.subj, r.pred, r.obj) for r in res.edges.select("subj", "pred", "obj").collect()}
    want = _oracle({"root_id": ROOT, "follow_references": False}).triple_set
    assert got == want


def test_depth_cap(spark):
    docs = generate_documents(spark, CFG)
    d1 = {r.id for r in reachable_docs(docs, ROOT, max_depth=1).collect()}
    d2 = {r.id for r in reachable_docs(docs, ROOT, max_depth=2).collect()}
    dall = {r.id for r in reachable_docs(docs, ROOT).collect()}
    assert d1 <= d2 <= dall
    assert len(d1) < len(dall)
    # hop values respect the cap
    hops = {r.hop for r in reachable_docs(docs, ROOT, max_depth=2).collect()}
    assert hops <= {0, 1, 2}
