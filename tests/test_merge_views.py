"""MERGE sink semantics (S9-S11/J3) + SQL views surface (Q4)."""

from knowledge_nexus_spark.storage.merge import merge_edges, merge_nodes, overwrite_page_chunks
from knowledge_nexus_spark.views import register_graph_views

NODE_COLS = (
    "id string, title string, type string, url string, "
    "content string, source string, last_edited_time string"
)
CHUNK_COLS = "page_id string, sequence int, content string, embedding array<float>"


def _node(id, title, ts):
    return (id, title, "Page", "", None, "Notion", ts)


def test_merge_nodes_freshness(spark):
    existing = spark.createDataFrame(
        [_node("a", "old A", "2024-01-01T00:00:00.000000Z"),
         _node("b", "old B", "2024-01-02T00:00:00.000000Z")], NODE_COLS)
    updates = spark.createDataFrame(
        [_node("a", "new A", "2024-01-03T00:00:00.000000Z"),   # newer → replaces
         _node("b", "same B", "2024-01-02T00:00:00.000000Z"),  # equal ts → stored kept
         _node("c", "new C", "2024-01-01T00:00:00.000000Z")], NODE_COLS)  # insert
    got = {r.id: r.title for r in merge_nodes(existing, updates).collect()}
    assert got == {"a": "new A", "b": "old B", "c": "new C"}


def test_merge_nodes_no_existing(spark):
    updates = spark.createDataFrame([_node("a", "A", None)], NODE_COLS)
    assert merge_nodes(None, updates).count() == 1


def test_overwrite_page_chunks(spark):
    existing = spark.createDataFrame(
        [("p1", 0, "old", None), ("p1", 1, "old2", None), ("p2", 0, "keep", None)],
        CHUNK_COLS)
    new = spark.createDataFrame([("p1", 0, "new", None)],
                                CHUNK_COLS)
    got = {(r.page_id, r.sequence): r.content
           for r in overwrite_page_chunks(existing, new).collect()}
    assert got == {("p1", 0): "new", ("p2", 0): "keep"}


def test_merge_edges_dedup(spark):
    cols = ["subj", "pred", "obj", "context"]
    existing = spark.createDataFrame([("a", "R", "b", "ctx")], cols)
    new = spark.createDataFrame(
        [("a", "R", "b", "ctx"), ("a", "R", "b", None), ("a", "R", "c", None)], cols)
    got = {tuple(r) for r in merge_edges(existing, new).collect()}
    assert got == {("a", "R", "b", "ctx"), ("a", "R", "b", ""), ("a", "R", "c", "")}


def test_sql_views(spark):
    nodes = spark.createDataFrame(
        [_node("a", "A", None), _node("b", "B", None)], NODE_COLS)
    edges = spark.createDataFrame(
        [("a", "CONTAINS", "b", "")], ["subj", "pred", "obj", "context"])
    register_graph_views(spark, nodes, edges)
    out = spark.sql(
        "SELECT n.title, e.pred FROM nodes n JOIN edges e ON n.id = e.subj"
    ).collect()
    assert [(r.title, r.pred) for r in out] == [("A", "CONTAINS")]
    adj = spark.sql("SELECT * FROM adjacency").collect()
    assert adj[0].id == "a" and adj[0].out_edges[0].obj == "b"


def test_destructive_reset(spark, tmp_path):
    from knowledge_nexus_spark.storage.merge import destructive_reset

    nodes_p, edges_p = str(tmp_path / "nodes"), str(tmp_path / "edges")
    spark.range(3).write.parquet(nodes_p)
    spark.range(3).write.parquet(edges_p)
    removed = destructive_reset(spark, nodes_p, edges_p, str(tmp_path / "absent"))
    assert removed == 2
    import os

    assert not os.path.exists(nodes_p) and not os.path.exists(edges_p)
    # idempotent: second wipe removes nothing, raises nothing
    assert destructive_reset(spark, nodes_p, edges_p) == 0
