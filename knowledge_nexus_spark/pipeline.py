"""The KG-construction pipeline: documents → nodes + edges (+ chunks).

Stage graph (SURVEY.md §3.1 rebuild lifecycle):
  1. freshness dedup (A5)              — window last-writer-wins
  2. extract: triples + bookmark nodes — Arrow mapInPandas over spans
  3. render + chunk + embed            — pandas UDFs, posexplode
  4. entity linking (J10)              — MinHashLSH blocking + cosine re-rank
  5. canonicalization (G3)             — salted iterative connected components
  6. orphan policy (J1/J2) + materialize nodes/edges

Each stage can be checkpointed via storage.checkpoint.StageCheckpointer so
a killed run resumes from the last committed snapshot (the reference's
cache short-circuits, cache_util.py:98-120 / notion_provider.py:80-91).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledge_nexus_spark.functions.extract import bookmark_nodes, extract_triples
from knowledge_nexus_spark.functions.render import render_spans
from knowledge_nexus_spark.operators.graphops import (
    add_missing_nodes,
    clean_orphans,
    content_docs,
    distinct_triples,
    freshness_dedup,
    page_nodes,
)


@dataclass(frozen=True)
class PipelineConfig:
    add_archived: bool = False  # config.yaml:16 add_archived_page_nodes
    add_removed: bool = False  # config.yaml:17 add_removed_page_nodes
    create_unprocessed: bool = False  # config.yaml:18 create_unprocessed_graph_nodes
    render_content: bool = True
    embedding_dim: int = 64
    chunk_size: int = 200  # token budget (config.yaml:50 max_tokens, scaled down)
    chunk_overlap: int = 20  # config.yaml:51 overlap, scaled proportionally


@dataclass
class GraphResult:
    nodes: DataFrame
    edges: DataFrame
    triples_raw: DataFrame  # pre-dedup per-encounter appends


def build_graph(
    spark: SparkSession, documents: DataFrame, cfg: PipelineConfig | None = None
) -> GraphResult:
    """documents(spans) → (nodes, edges). Pure transformations, no actions —
    callers decide where to checkpoint/materialize."""
    cfg = cfg or PipelineConfig()

    docs = freshness_dedup(documents)

    nodes = page_nodes(docs, cfg.add_archived, cfg.add_removed)
    processed = content_docs(docs)
    if cfg.render_content:
        rendered = processed.select(
            "doc_id", render_spans(F.col("spans")).alias("_rendered")
        )
        nodes = (
            nodes.drop("content")
            .join(rendered, nodes["id"] == rendered["doc_id"], "left")
            .select(
                "id",
                "title",
                "type",
                "url",
                F.col("_rendered").alias("content"),
                "source",
                "last_edited_time",
            )
        )

    triples_raw = extract_triples(processed)
    all_nodes = nodes.unionByName(bookmark_nodes(triples_raw))

    if cfg.create_unprocessed:
        all_nodes = add_missing_nodes(triples_raw, all_nodes)
        kept = triples_raw
    else:
        kept = clean_orphans(triples_raw, all_nodes)

    edges = distinct_triples(kept)
    return GraphResult(nodes=all_nodes, edges=edges, triples_raw=triples_raw)
