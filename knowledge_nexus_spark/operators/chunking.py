"""Chunk + embed stage (SURVEY.md §3.1 stage 2).

Reference loop: per page of type Page/Database
(content_chunker_and_embedder.py:165-168) → create_chunks (W5) →
clean_markdown per chunk (:180) → embed the CLEANED text, store the RAW
chunk text (:181-186) → chunks written with a per-page sequence number
(neo4j_manager.py:216-228).

One Arrow pass: mapInPandas emits (page_id, sequence, content, embedding)
directly — chunking, cleaning and embedding happen on the same batch so
chunk text crosses the Python boundary exactly once. The Page/Database
gate is a native filter BEFORE the UDF (the reference applies it first
too, and Catalyst can't push predicates through opaque Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knowledge_nexus_spark.functions.chunker import clean_markdown_py, create_chunks, get_tokenizer
from knowledge_nexus_spark.functions.embed import embed_text_py
from knowledge_nexus_spark.schema import CHUNKS_SCHEMA, REL_HAS_CHUNK


def chunk_and_embed(
    nodes: DataFrame,
    chunk_size: int = 200,
    overlap: int = 20,
    dim: int = 64,
    tokenizer_model: str | None = None,
) -> DataFrame:
    """nodes → chunks(page_id, sequence, content, embedding)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = get_tokenizer(tokenizer_model)  # built per worker, not pickled
        for pdf in batches:
            out = {"page_id": [], "sequence": [], "content": [], "embedding": []}
            for pid, title, ts, content in zip(
                pdf["id"], pdf["title"], pdf["last_edited_time"], pdf["content"]
            ):
                chunks = create_chunks(title, ts, content, chunk_size, overlap, tok)
                for i, c in enumerate(chunks):
                    out["page_id"].append(pid)
                    out["sequence"].append(i)
                    out["content"].append(c)
                    out["embedding"].append(embed_text_py(clean_markdown_py(c), dim))
            yield pd.DataFrame(out)

    gated = nodes.filter(F.col("type").isin("Page", "Database")).select(
        "id", "title", "last_edited_time", "content"
    )
    # single-row-group inputs plan a 1-task scan; the chunk+embed UDF is
    # the expensive stage, so guarantee it fans out (no-op when the
    # upstream already has >= cores partitions — see partitioning.py)
    from knowledge_nexus_spark.partitioning import ensure_min_parallelism

    return ensure_min_parallelism(gated).mapInPandas(gen, schema=CHUNKS_SCHEMA)


def has_chunk_triples(chunks: DataFrame) -> DataFrame:
    """(page, HAS_CHUNK, page#seq) edges — the join to pages is free because
    chunks carry page_id by construction (J4)."""
    return chunks.select(
        F.col("page_id").alias("subj"),
        F.lit(REL_HAS_CHUNK).alias("pred"),
        F.concat_ws("#", F.col("page_id"), F.col("sequence")).alias("obj"),
        F.lit(None).cast("string").alias("context"),
    )
