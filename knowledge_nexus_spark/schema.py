"""Fixed StructType schemas for the engine (SURVEY.md §1).

Reference data model: graph_rag/data_model/graph_data_classes.py:29-70
(GraphPage / GraphRelation / Chunk / ProcessedData). The interleaved span
sequence is the BASELINE.json input_hint table:
documents(doc_id STRING, spans ARRAY<STRUCT<kind, text, media_ref, offset>>).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- enums (graph_data_classes.py:8-18) -----------------------------------
REL_CONTAINS = "CONTAINS"
REL_REFERENCES = "REFERENCES"
REL_HAS_CHUNK = "HAS_CHUNK"
REL_MENTIONS = "MENTIONS"  # semantic layer (entity_extractor.py / README roadmap)
REL_LINKS_TO = "LINKS_TO"  # entity-linking output (north_star J10)

PAGE = "Page"
DATABASE = "Database"
BOOKMARK = "Bookmark"
CHUNK = "Chunk"

# --- interleaved span sequence (input_hint) --------------------------------
SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("title", T.StringType()),
        T.StructField("doc_kind", T.StringType()),  # page | database
        T.StructField("url", T.StringType()),
        T.StructField("archived", T.BooleanType()),
        T.StructField("in_trash", T.BooleanType()),
        T.StructField("last_edited_time", T.StringType()),  # ISO-8601, kept as string
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
    ]
)

# --- graph tables -----------------------------------------------------------
NODES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("title", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("last_edited_time", T.StringType()),
    ]
)

TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("context", T.StringType()),
    ]
)

TRIPLE_TYPE = T.StructType(TRIPLES_SCHEMA.fields)

CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("page_id", T.StringType(), False),
        T.StructField("sequence", T.IntegerType(), False),
        T.StructField("content", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)

MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("label", T.StringType()),
        T.StructField("mention", T.StringType()),
    ]
)

# span kinds (to_markdown_parser.py:40-72, notion_provider.py:184-217)
RICH_TEXT_KINDS = [
    "paragraph",
    "heading_1",
    "heading_2",
    "heading_3",
    "bulleted_list_item",
    "numbered_list_item",
    "to_do",
    "toggle",
    "code",
    "quote",
    "callout",
    "template",
]
URL_KINDS = ["bookmark", "embed", "link_preview"]
CHILD_KINDS = ["child_page", "child_database"]
MEDIA_KINDS = ["image", "video", "audio", "file", "pdf"]
STRUCT_KINDS = ["divider", "table_of_contents", "breadcrumb", "equation"]
# P5 annotated rich-text: structured runs JSON carried in the span's text
# field (to_markdown_parser.py:353-379 annotation fold)
RUNS_KIND = "rich_runs"
ALL_KINDS = (
    RICH_TEXT_KINDS + URL_KINDS + CHILD_KINDS + MEDIA_KINDS + STRUCT_KINDS
    + ["link_to_page", RUNS_KIND]
)
