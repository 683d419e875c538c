"""Identity / alias normalization as native column expressions.

Reference semantics:
  - UUID extraction from a Notion href → undashed 32-hex
    (graph_rag/data_source/notion_provider.py:18-33)
  - UUID canonicalization: strip dashes iff the value is a dashed UUID,
    identity otherwise (notion_provider.py:36-37) — applied to every
    subj/obj at relation-append time (notion_provider.py:169,178,299).

All JVM-side (regexp_extract / regexp_replace) so they stay inside
whole-stage codegen; these run on every triple at 10^12-doc scale, so
they must NOT be Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# uuid body: 8-4-4-4-12 hex with optional dashes (notion_provider.py:26)
_UUID_BODY = "[a-f0-9]{8}-?[a-f0-9]{4}-?[a-f0-9]{4}-?[a-f0-9]{4}-?[a-f0-9]{12}"

# anchored like the reference's re.match: optional notion host, then a
# mandatory '/', optional username/ and page-name- segments, then the uuid
NOTION_HREF_PATTERN = (
    "^(?:https://www\\.notion\\.so)?/(?:[a-zA-Z0-9-]+/)?(?:[a-zA-Z0-9-]+-)?"
    f"({_UUID_BODY})"
)

DASHED_UUID_PATTERN = "^\\w{8}-\\w{4}-\\w{4}-\\w{4}-\\w{12}$"

MARKDOWN_LINK_PATTERN = r"\[([^\]]*)\]\(([^)]+)\)"


def extract_notion_uuid(href: Column) -> Column:
    """Undashed uuid from a Notion URL, NULL when the href is not one."""
    raw = F.regexp_extract(href, NOTION_HREF_PATTERN, 1)
    return F.nullif(F.regexp_replace(raw, "-", ""), F.lit(""))


def normalize_uuid(col: Column) -> Column:
    """Strip dashes iff the whole value is a dashed uuid; identity otherwise."""
    return F.when(col.rlike(DASHED_UUID_PATTERN), F.regexp_replace(col, "-", "")).otherwise(col)


def title_coalesce(title: Column, spans: Column) -> Column:
    """P3 title extraction: page-level title, else the first title-typed
    property's text, else 'Untitled' (notion_provider.py:40-48)."""
    prop_title = F.filter(spans, lambda s: s["kind"] == F.lit("prop_title"))
    first_prop = F.when(F.size(prop_title) > 0, prop_title[0]["text"])
    return F.coalesce(F.nullif(title, F.lit("")), F.nullif(first_prop, F.lit("")), F.lit("Untitled"))


def markdown_plain_text(col: Column) -> Column:
    """Markdown links -> their anchor text (rich-text plain_text concat,
    notion_provider.py:51-52)."""
    return F.regexp_replace(col, MARKDOWN_LINK_PATTERN, "$1")
