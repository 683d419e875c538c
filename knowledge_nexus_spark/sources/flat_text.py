"""Adapter: flat text documents → interleaved-span documents.

The engine's native input is documents(doc_id, spans ARRAY<STRUCT<...>>)
(BASELINE.json input_hint). Real corpora often arrive flat —
(doc_id, text) — e.g. the driver testdata's ``documents`` table. This
connector lifts a flat table into the span schema with a deterministic,
fully NATIVE (no Python) construction:

  - one ``paragraph`` span carrying the text
  - one ``child_page`` span whose target is a deterministic function of
    the doc id (a synthetic containment chain — gives the graph structure)
  - one ``link_to_page`` span to a second deterministic target

so the whole KG pipeline (extract → orphan policy → materialize) can run
against any flat corpus. Every derived value is a pure function of the
row, so the adapter is reproducible and SQL-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contains_target(doc_id_col, n_docs_col):
    """Deterministic containment target: (doc_id*31 + 7) mod n_docs."""
    return F.pmod(doc_id_col * 31 + 7, n_docs_col)


def references_target(doc_id_col, n_docs_col):
    """Deterministic reference target: (doc_id*17 + 3) mod n_docs."""
    return F.pmod(doc_id_col * 17 + 3, n_docs_col)


def flat_docs_to_span_docs(
    flat: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_media: bool = False,
) -> DataFrame:
    """flat(doc_id, text, ...) → engine documents schema.

    ``with_media=True`` interleaves deterministic media spans into the
    sequence (an ``image`` right after the paragraph, a second one
    appended for even ids) so the full multimodal pipeline — caption
    alignment, media nodes, HAS_MEDIA edges — exercises the
    BASELINE.json input shape from a flat corpus. Media kinds emit no
    extraction triples (functions/extract.span_triples_expr has no media
    arm), so the CONTAINS/REFERENCES output is bit-identical either way."""
    n = flat.count()
    did = F.col(id_col).cast("long")
    span = lambda kind, text, ref: F.struct(  # noqa: E731
        F.lit(kind).alias("kind"),
        (text if text is not None else F.lit(None).cast("string")).alias("text"),
        (ref if ref is not None else F.lit(None).cast("string")).alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    base = [
        span("paragraph", F.col(text_col), None),
    ]
    if with_media:
        base.append(
            span(
                "image",
                None,
                F.concat(F.lit("img://"), did.cast("string"), F.lit("/a")),
            )
        )
    base += [
        span("child_page", F.lit("Child"), contains_target(did, F.lit(n)).cast("string")),
        span("link_to_page", None, references_target(did, F.lit(n)).cast("string")),
    ]
    spans = F.array(*base)
    if with_media:
        empty = F.array().cast(
            "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
        )
        tail = F.when(
            did % 2 == 0,
            F.array(
                span(
                    "image",
                    None,
                    F.concat(F.lit("img://"), did.cast("string"), F.lit("/b")),
                )
            ),
        ).otherwise(empty)
        spans = F.concat(spans, tail)
    return flat.select(
        did.cast("string").alias("doc_id"),
        F.concat(F.lit("Doc "), did.cast("string")).alias("title"),
        F.lit("page").alias("doc_kind"),
        F.concat(F.lit("flat://"), did.cast("string")).alias("url"),
        F.lit(False).alias("archived"),
        F.lit(False).alias("in_trash"),
        F.lit("2024-01-01T00:00:00.000000Z").alias("last_edited_time"),
        spans.alias("spans"),
    )
