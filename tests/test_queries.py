"""Query-side retrieval: top-k seeds, k-hop expansion, thresholds, pruning
(reference pipeline Q1-Q3/J5-J9/W2-W3)."""

from pyspark.sql import functions as F

from knowledge_nexus_spark.datagen import CorpusConfig, generate_documents
from knowledge_nexus_spark.pipeline import PipelineConfig, run_pipeline
from knowledge_nexus_spark.queries import comention_strength, k_hop, retrieve, topk_chunks


def _graph(spark, tmp_path):
    docs = generate_documents(spark, CorpusConfig(n_docs=80, seed=5))
    ck, nodes, edges, chunks = run_pipeline(
        spark, docs, str(tmp_path), PipelineConfig(with_chunks=True)
    )
    return nodes, edges, chunks


def test_topk_chunks_self_retrieval(spark, tmp_path):
    nodes, edges, chunks = _graph(spark, tmp_path)
    sample = chunks.first()
    from knowledge_nexus_spark.functions.chunker import clean_markdown_py
    from knowledge_nexus_spark.functions.embed import embed_text_py

    qvec = embed_text_py(clean_markdown_py(sample.content), 64)
    top = topk_chunks(chunks, qvec, k=3).collect()
    assert (top[0].page_id, top[0].sequence) == (sample.page_id, sample.sequence)
    assert top[0].score > 0.999


def test_k_hop_distances(spark):
    edges = spark.createDataFrame(
        [("a", "R", "b", None), ("b", "R", "c", None), ("c", "R", "d", None), ("x", "R", "y", None)],
        "subj string, pred string, obj string, context string",
    )
    seeds = spark.createDataFrame([("a",)], ["id"])
    got = {r.id: r.hop for r in k_hop(edges, seeds, k=2).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}  # d is 3 hops, x/y disconnected


def test_retrieve_end_to_end(spark, tmp_path):
    nodes, edges, chunks = _graph(spark, tmp_path)
    out = retrieve(nodes, edges, chunks, "graph knowledge spark corpus", top_k=5)
    got_nodes = out["nodes"].collect()
    assert 0 < len(got_nodes) <= 20
    ids = {r.id for r in got_nodes}
    kept = out["edges"].collect()
    for e in kept:
        assert e.subj in ids and e.obj in ids  # J9 prune invariant
    # seeds (hop 0) must be present and carry the highest similarities
    hops = {r.id: r.hop for r in got_nodes}
    assert 0 in set(hops.values())


def test_comention_strength(spark):
    edges = spark.createDataFrame(
        [("d1", "M", "a", None), ("d1", "M", "b", None), ("d2", "M", "a", None),
         ("d2", "M", "b", None), ("d3", "M", "a", None), ("d3", "M", "c", None)],
        "subj string, pred string, obj string, context string",
    )
    rows = comention_strength(edges, top_n=5).collect()
    assert (rows[0].e1, rows[0].e2, rows[0].strength) == ("a", "b", 2)


def test_comention_counts_context_distinct_parallel_edges(spark):
    """The reference MERGEs relationships keyed on {context}
    (neo4j_manager.py:234), so a page mentioning the same entity in two
    contexts contributes 2 to every pair count — the (subj, obj)
    projection must NOT be deduplicated."""
    edges = spark.createDataFrame(
        [("d1", "M", "a", "ctx1"), ("d1", "M", "a", "ctx2"),
         ("d1", "M", "b", "ctx1"), ("d2", "M", "a", "x"), ("d2", "M", "b", "y")],
        "subj string, pred string, obj string, context string",
    )
    rows = comention_strength(edges, top_n=5).collect()
    # d1 pairs a twice with b (two a-contexts), d2 once → strength 3
    assert (rows[0].e1, rows[0].e2, rows[0].strength) == ("a", "b", 3)


def test_comention_hot_key_capped(spark):
    """A hub subject with 10³ objects must not explode quadratically: the
    per-key cap bounds its contribution at cap² pairs, and pairs among the
    cap's retained (lexicographically first) objects are still counted."""
    hub = [("hub", "M", f"e{i:04d}", None) for i in range(1000)]
    small = [("s1", "M", "e0001", None), ("s1", "M", "e0002", None)]
    edges = spark.createDataFrame(
        hub + small, "subj string, pred string, obj string, context string"
    )
    rows = comention_strength(edges, top_n=3, per_key_cap=64).collect()
    # (e0001, e0002) co-occur under both the hub (within cap) and s1
    assert (rows[0].e1, rows[0].e2, rows[0].strength) == ("e0001", "e0002", 2)
    # total pairs bounded by C(64,2) + 1 key's worth, nowhere near C(1000,2)
    full = comention_strength(edges, top_n=10**9, per_key_cap=64).count()
    assert full <= 64 * 63 // 2
