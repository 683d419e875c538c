"""Span-sequence → markdown rendering (the P5/P8/P9 projection).

Per-kind templates mirror graph_rag/data_source/to_markdown_parser.py:95-348
(block handlers) and :76-85 (property rendering, which the reference places
before the block content — notion_provider.py:152-162). The default
exclusion lists from config/config.yaml:22-34 are applied.

Executed as ONE Arrow-vectorized pandas UDF over the spans array column —
parallelism is across documents, per-doc rendering is a cheap sequential
string fold (exactly the per-page loop shape of the reference, minus the
network). Span order is preserved: the fold iterates the array in order.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

INDENT = "  "  # config.yaml:21 markdown_parser_options.indent

EXCLUDED_BLOCK_KINDS = {"breadcrumb", "column_list", "column", "table_of_contents"}

PROP_KINDS = {"prop_title", "prop_rich_text", "prop_relation", "prop_url"}


def _render_block(kind: str, text: str, media_ref: str, offset: int) -> str:
    """One span → markdown fragment (to_markdown_parser.py block handlers)."""
    indent = INDENT * (offset or 0)
    text = text or ""
    if kind == "paragraph":
        return f"{indent}{text}\n\n"
    if kind in ("heading_1", "heading_2", "heading_3"):
        level = int(kind[-1])
        return f"{indent}{'#' * level} {text}\n\n"
    if kind == "bulleted_list_item":
        return f"{indent}- {text}\n"
    if kind == "numbered_list_item":
        return f"{indent}1. {text}\n"
    if kind == "to_do":
        box = "x" if media_ref == "checked" else " "
        return f"{indent}- [{box}] {text}\n"
    if kind == "toggle":
        return f"{indent}<details>\n{indent}<summary>{text}</summary>\n{indent}<details>\n\n"
    if kind == "code":
        lang = media_ref or ""
        return f"{indent}```{lang}\n{text}\n{indent}```\n\n"
    if kind == "quote":
        return f"{indent}> {text}\n\n"
    if kind == "callout":
        icon = f" :{media_ref}:" if media_ref else ""
        return f"{indent}>{icon} {text}\n\n"
    if kind == "template":
        return f"{indent}[Template: {text}]\n\n"
    if kind == "child_database":
        return f"{indent}Child database: {text}\n\n"
    if kind == "child_page":
        return f"{indent}Child page: {text}\n\n"
    if kind == "bookmark":
        return f"{indent}[{text or 'Bookmark'}]({media_ref})\n\n"
    if kind == "embed":
        return f"{indent}[Embed: {media_ref}]\n\n"
    if kind == "link_preview":
        return f"{indent}[Link Preview: {media_ref}]\n\n"
    if kind == "link_to_page":
        uuid = (media_ref or "").replace("-", "")
        return f"{indent}[Link to page: {uuid}]\n\n"
    if kind == "image":
        return f"{indent}![{text}]({media_ref})\n\n"
    if kind == "video":
        cap = f" - {text}" if text else ""
        return f"{indent}[Video: {media_ref}{cap}]\n\n"
    if kind == "file":
        cap = f" - {text}" if text else ""
        return f"{indent}[File: [{text or 'File'}]({media_ref}){cap}]\n\n"
    if kind == "pdf":
        # NB: the reference template emits an unbalanced ']' here
        # (to_markdown_parser.py:306-310) — kept for parity
        cap = f" - {text}" if text else ""
        return f"{indent}[PDF]({media_ref}){cap}]\n\n"
    if kind == "divider":
        return f"{indent}---\n\n"
    if kind == "equation":
        return f"{indent}$$\n{text}\n$$\n\n"
    if kind in EXCLUDED_BLOCK_KINDS:
        return ""
    return ""  # unsupported kinds render empty (to_markdown_parser.py:91-93)


def _render_prop(kind: str, text: str, media_ref: str) -> str | None:
    """Property spans → '**name**: value' line (to_markdown_parser.py:76-85).

    Our span encoding: prop_title/prop_rich_text carry the value in `text`
    and the property name in `media_ref`; prop_relation/prop_url carry the
    name in `text` and the target/url in `media_ref`."""
    if kind == "prop_title" or kind == "prop_rich_text":
        if not text:
            return None
        return f"**{media_ref or 'Name'}**: {text}\n"
    if kind == "prop_relation":
        if not media_ref:
            return None
        return f"**{text or 'Relation'}**: [Related Page]({media_ref})\n"
    if kind == "prop_url":
        if not media_ref:
            return None
        return f"**{text or 'URL'}**: [{media_ref}]({media_ref})\n"
    return None


def render_spans_py(spans: list | None) -> str:
    """Full document render: properties header first, then blocks in order."""
    if spans is None:
        return ""
    props = ""
    body = ""
    for s in spans:
        kind = s["kind"]
        if kind in PROP_KINDS:
            line = _render_prop(kind, s.get("text"), s.get("media_ref"))
            if line:
                props += line
        else:
            body += _render_block(kind, s.get("text"), s.get("media_ref"), s.get("offset") or 0)
    header = f"###Properties:\n{props}" if props else ""
    return header + body


@F.pandas_udf(T.StringType())
def render_spans(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for spans_series in it:
        yield spans_series.map(render_spans_py)
