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

from knowledge_nexus_spark.functions.extract import (
    bookmark_nodes,
    bookmark_urls,
    extract_triples,
    extract_triples_native,
)
from knowledge_nexus_spark.functions.render import render_spans, render_spans_native
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
    native_extract: bool = True  # JVM codegen extraction (pandas variant is the spec)
    native_render: bool = True  # JVM aggregate-fold render (pandas variant is the spec)
    embedding_dim: int = 64
    chunk_size: int = 200  # token budget (config.yaml:50 max_tokens, scaled down)
    chunk_overlap: int = 20  # config.yaml:51 overlap, scaled proportionally
    with_chunks: bool = True  # stage 3 (chunk + embed + HAS_CHUNK edges)
    with_linking: bool = False  # stage 4 (J10 mention→entity LINKS_TO edges)
    # media stage: caption-aligned media nodes + HAS_MEDIA edges from the
    # interleaved span sequence (multimodal.media_graph). Off by default —
    # text-only corpora produce zero media spans either way, but the stage
    # still costs a second scan of the wide spans column.
    with_media: bool = False
    canonicalize: bool = False  # stage 5 (G3 alias connected components)
    link_min_cosine: float = 0.6
    alias_min_cosine: float = 0.95  # entity-entity merge confidence
    # explicit hub-skew handling in orphan cleaning: endpoint keys with at
    # least this many triples are checked as literal predicates instead of
    # shuffled to one reducer (None disables; see graphops.clean_orphans)
    skew_hot_min_count: int | None = 100_000
    # cache the fused intermediate (True) vs recompute per sink branch
    # (False). WARNING: False is pathological in build_graph — the fused
    # projection has 4+ consumers (nodes, bookmarks, hot-key pre-agg, semi
    # joins) and each would re-run render+extract; it exists only for
    # run_pipeline-style flows where stage snapshots replace the cache.
    persist_intermediate: bool = True
    # freshness dedup via broadcast few-dups joins instead of the wide
    # window shuffle (see graphops.freshness_dedup tradeoff notes)
    dedup_few_dups: bool = False


_HEADER_COLS = [
    "doc_id", "title", "doc_kind", "url", "archived", "in_trash",
    "last_edited_time",
]


def fused_docs_projection(docs: DataFrame, cfg: "PipelineConfig") -> DataFrame:
    """The SINGLE-PASS projection at the heart of the pipeline: from a
    (deduplicated) documents frame, compute the rendered content AND the
    per-document triple array together — the wide spans column is scanned
    once and then DROPPED.

    Two stacked Projects: the first rewrites spans with a typed ``runs``
    field (rich_runs JSON parsed ONCE per span — render fold, triple
    extraction, and bookmark hrefs all share that single parse; Catalyst
    keeps the Projects separate because the parse is non-cheap and
    multiply-referenced), the second folds content + triples from the
    parsed spans. Shared by build_graph and the incremental refresh."""
    from knowledge_nexus_spark.functions.extract import (
        TRIPLE_ARRAY_DDL,
        doc_triples_expr,
    )
    from knowledge_nexus_spark.functions.render import spans_with_runs

    processed_pred = ~F.col("archived") & ~F.col("in_trash")
    parsed = docs.select(*_HEADER_COLS, spans_with_runs(F.col("spans")).alias("spans"))

    empty_tris = F.array().cast(TRIPLE_ARRAY_DDL)
    content_expr = (
        F.when(processed_pred, render_spans_native(F.col("spans"), runs_parsed=True))
        if cfg.render_content
        else F.lit(None).cast("string")
    )
    # bookmark urls ride INSIDE the triple array (the `bm` flag) — one
    # extraction pass serves both the edges and the bookmark branch; a
    # separate bookmark-url projection would re-run the span regexes.
    return parsed.select(
        *_HEADER_COLS,
        content_expr.alias("content"),
        F.when(processed_pred, doc_triples_expr(F.col("spans"), runs_parsed=True))
        .otherwise(empty_tris)
        .alias("_tris"),
    )


@dataclass
class GraphResult:
    nodes: DataFrame
    edges: DataFrame
    triples_raw: DataFrame  # pre-dedup per-encounter appends
    documents: DataFrame | None = None  # freshness-deduped (persisted) input

    def unpersist(self) -> None:
        # blocking: the async default leaves the old run's blocks occupying
        # storage memory while the next run populates its cache — the new
        # blocks then land in the DISK store and every subsequent read pays
        # full deserialization (profiled: identical 1.2 GB cached reads cost
        # 6-13x the CPU on a back-to-back second run in one JVM)
        self.triples_raw.unpersist(blocking=True)
        if self.documents is not None:
            self.documents.unpersist(blocking=True)


def build_graph(
    spark: SparkSession,
    documents: DataFrame,
    cfg: PipelineConfig | None = None,
    persist_triples: bool = True,
) -> GraphResult:
    """documents(spans) → (nodes, edges).

    ``persist_triples`` caches the raw triple extraction: both the bookmark
    nodes and the edge set consume it, and without reuse the (Python UDF)
    extraction would execute 2-3× inside one job tree. The freshness-deduped
    documents are persisted for the same reason — the nodes/render branch
    and the extraction branch both consume them, and the dedup is the
    single widest shuffle in the plan. In the checkpointed ``run_pipeline``
    the stage snapshots play this role instead."""
    from pyspark.storagelevel import StorageLevel

    cfg = cfg or PipelineConfig()

    if cfg.native_extract and cfg.native_render:
        # SINGLE-PASS plan (see fused_docs_projection): content + triple
        # array computed together directly after the dedup window — the
        # wide spans column is scanned once, shuffled once, and DROPPED;
        # the persisted intermediate holds only (header cols, content,
        # triple array). Halves the wide-data I/O vs separate render and
        # extract branches.
        from knowledge_nexus_spark.functions.extract import normalize_uuid_col

        deduped = freshness_dedup(documents, few_dups=cfg.dedup_few_dups)
        if cfg.with_media and cfg.persist_intermediate:
            # the media branch re-scans the wide spans column; persisting
            # the deduped frame keeps the dedup window (the plan's widest
            # shuffle) from running twice. MEMORY_AND_DISK — spans spill.
            deduped = deduped.persist(StorageLevel.MEMORY_AND_DISK)
        combined = fused_docs_projection(deduped, cfg)
        if cfg.persist_intermediate:
            combined = combined.persist(StorageLevel.MEMORY_AND_DISK)
        docs = combined  # header columns preserved; spans intentionally gone

        keep = F.lit(True)
        if not cfg.add_archived:
            keep = keep & ~F.col("archived")
        if not cfg.add_removed:
            keep = keep & ~F.col("in_trash")
        title = (
            F.when(F.col("archived"), F.concat(F.lit("[ARCHIVED] "), F.col("title")))
            .when(F.col("in_trash"), F.concat(F.lit("[REMOVED] "), F.col("title")))
            .otherwise(F.col("title"))
        )
        nodes = combined.filter(keep).select(
            F.col("doc_id").alias("id"),
            title.alias("title"),
            F.when(F.col("doc_kind") == "database", F.lit("Database"))
            .otherwise(F.lit("Page"))
            .alias("type"),
            "url",
            "content",
            F.lit("Notion").alias("source"),
            "last_edited_time",
        )
        exploded = combined.select(
            normalize_uuid_col(F.col("doc_id")).alias("subj"),
            F.explode("_tris").alias("t"),
        )
        triples_raw = exploded.select("subj", "t.pred", "t.obj", "t.context")
        burl_frame = (
            exploded.filter(F.col("t.bm")).select(F.col("t.obj").alias("id")).distinct()
        )
    else:
        # legacy two-branch plan (the Arrow/pandas spec implementations)
        docs = freshness_dedup(documents).persist(StorageLevel.MEMORY_AND_DISK)

        nodes = page_nodes(docs, cfg.add_archived, cfg.add_removed)
        processed = content_docs(docs)
        if cfg.render_content:
            render = render_spans_native if cfg.native_render else render_spans
            rendered = processed.select(
                "doc_id", render(F.col("spans")).alias("_rendered")
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
        extract = extract_triples_native if cfg.native_extract else extract_triples
        triples_raw = extract(processed)
        burl_frame = bookmark_urls(processed)

    if persist_triples and cfg.persist_intermediate:
        triples_raw = triples_raw.persist(StorageLevel.MEMORY_AND_DISK)
    all_nodes = nodes.unionByName(bookmark_nodes(burl_frame))

    media_edges = None
    media_nodes = None
    if cfg.with_media:
        from knowledge_nexus_spark.multimodal import media_graph

        span_docs = (
            deduped if (cfg.native_extract and cfg.native_render) else docs
        )
        media_nodes, media_edges = media_graph(span_docs)

    if cfg.create_unprocessed:
        all_nodes = add_missing_nodes(triples_raw, all_nodes)
        kept = triples_raw
    else:
        kept = clean_orphans(triples_raw, all_nodes, cfg.skew_hot_min_count)

    if media_nodes is not None:
        # unioned AFTER orphan cleaning: media refs are never triple
        # endpoints (extraction has no media arm), so shipping them into
        # the endpoint semi-joins would only widen the build side
        all_nodes = all_nodes.unionByName(media_nodes)

    edges = distinct_triples(kept)
    if media_edges is not None:
        # HAS_MEDIA pairs are distinct by construction (media_graph
        # aggregates per (doc, ref)) — no second distinct shuffle needed;
        # same NULL-context convention as distinct_triples ('' not NULL)
        edges = edges.unionByName(
            media_edges.withColumn("context", F.coalesce(F.col("context"), F.lit("")))
        )
    return GraphResult(
        nodes=all_nodes, edges=edges, triples_raw=triples_raw, documents=docs
    )


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    workdir: str,
    cfg: PipelineConfig | None = None,
):
    """Full checkpointed run: every stage is a committed snapshot, a rerun
    resumes from the last committed one (SURVEY.md §4.4). Returns the
    checkpointer (whose ``metrics`` carry per-stage per-partition lineage)
    plus the final nodes/edges/chunks DataFrames."""
    from knowledge_nexus_spark.operators.chunking import chunk_and_embed, has_chunk_triples
    from knowledge_nexus_spark.storage.checkpoint import StageCheckpointer

    cfg = cfg or PipelineConfig()
    ck = StageCheckpointer(spark, workdir)

    docs = ck.load_or_compute("s1_documents", lambda: freshness_dedup(documents))

    processed = content_docs(docs)
    extract = extract_triples_native if cfg.native_extract else extract_triples
    triples_raw = ck.load_or_compute("s2_triples_raw", lambda: extract(processed))

    def _nodes():
        nodes = page_nodes(docs, cfg.add_archived, cfg.add_removed)
        if cfg.render_content:
            render = render_spans_native if cfg.native_render else render_spans
            rendered = processed.select(
                "doc_id", render(F.col("spans")).alias("_rendered")
            )
            nodes = (
                nodes.drop("content")
                .join(rendered, nodes["id"] == rendered["doc_id"], "left")
                .select(
                    "id", "title", "type", "url",
                    F.col("_rendered").alias("content"),
                    "source", "last_edited_time",
                )
            )
        return nodes.unionByName(bookmark_nodes(bookmark_urls(processed)))

    nodes = ck.load_or_compute("s3_nodes", _nodes)

    chunks = None
    extra_edges = None
    if cfg.with_chunks:
        chunks = ck.load_or_compute(
            "s4_chunks",
            lambda: chunk_and_embed(
                nodes, cfg.chunk_size, cfg.chunk_overlap, cfg.embedding_dim
            ),
        )
        extra_edges = has_chunk_triples(chunks)

    if cfg.with_linking:
        from knowledge_nexus_spark.operators.linking import detect_mentions, link_entities

        def _links():
            mentions = detect_mentions(processed)
            entities = nodes.select("id", F.col("title").alias("name"))
            return link_entities(
                mentions, entities, min_cosine=cfg.link_min_cosine,
                embedding_dim=cfg.embedding_dim,
            )

        links = ck.load_or_compute("s5_links", _links)
        link_edges = links.select(
            F.col("doc_id").alias("subj"),
            F.lit("LINKS_TO").alias("pred"),
            F.col("entity_id").alias("obj"),
            F.col("mention").alias("context"),
        )
        extra_edges = link_edges if extra_edges is None else extra_edges.unionByName(link_edges)

    media_nodes = None
    if cfg.with_media:
        from knowledge_nexus_spark.multimodal import media_graph

        def _media():
            _, m_edges = media_graph(docs)
            return m_edges.withColumn(
                "context", F.coalesce(F.col("context"), F.lit(""))
            )

        media_edges = ck.load_or_compute("s7_media", _media)
        # nodes for the same media refs — without them every HAS_MEDIA
        # edge would dangle (build_graph unions them too, pipeline
        # twin-parity pinned by test_run_pipeline_media_nodes)
        media_nodes = ck.load_or_compute(
            "s7_media_nodes", lambda: media_graph(docs)[0]
        )
        extra_edges = (
            media_edges
            if extra_edges is None
            else extra_edges.unionByName(media_edges)
        )

    def _edges():
        base = triples_raw
        if cfg.canonicalize and cfg.with_linking:
            from knowledge_nexus_spark.operators.components import canonical_map, rewrite_triples

            links = ck.load("s5_links")
            alias_edges = (
                links.filter(F.col("cosine") >= cfg.alias_min_cosine)
                .select(F.col("mention").alias("src"), F.col("entity_id").alias("dst"))
            )
            mapping = canonical_map(alias_edges, nodes.select("id"))
            base = rewrite_triples(base, mapping)
        if cfg.create_unprocessed:
            kept = base
        else:
            kept = clean_orphans(base, nodes)
        if extra_edges is not None:
            kept = kept.unionByName(extra_edges)
        return distinct_triples(kept)

    edges = ck.load_or_compute("s6_edges", _edges)

    final_nodes = nodes
    if cfg.create_unprocessed:
        final_nodes = ck.load_or_compute(
            "s7_nodes_final", lambda: add_missing_nodes(ck.load("s2_triples_raw"), nodes)
        )
    if media_nodes is not None:
        # after add_missing_nodes: media refs are never triple endpoints
        # (extraction has no media arm), same ordering as build_graph
        final_nodes = final_nodes.unionByName(media_nodes)

    ck.write_run_metrics()
    return ck, final_nodes, edges, chunks
