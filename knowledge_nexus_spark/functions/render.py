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

PROP_KINDS = {
    "prop_title", "prop_rich_text", "prop_relation", "prop_url",
    "prop_checkbox", "prop_date", "prop_email", "prop_number", "prop_select",
    "prop_multi_select", "prop_status", "prop_people", "prop_phone_number",
    "prop_files", "prop_formula", "prop_rollup", "prop_created_time",
    "prop_last_edited_time",
}

# excluded property types (config.yaml:22-28): created_by, last_edited_by,
# unique_id, verification — spans of those kinds render to nothing
EXCLUDED_PROP_KINDS = {
    "prop_created_by", "prop_last_edited_by", "prop_unique_id", "prop_verification",
}


def _format_date(value: str) -> str:
    """ISO-8601 → 'YYYY-MM-DD HH:MM:SS', passthrough on parse failure
    (to_markdown_parser.py:382-387)."""
    from datetime import datetime

    try:
        return datetime.fromisoformat(value.replace("Z", "+00:00")).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
    except ValueError:
        return value


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
    if kind == "synced_block":
        if media_ref:
            return f"{indent}[Synced Block: Original ID {media_ref}]\n\n"
        return f"{indent}[Original Synced Block]\n\n"
    if kind == "table":
        # media_ref carries "width,has_col_header,has_row_header"
        w, ch, rh = ((media_ref or "0,False,False").split(",") + ["False", "False"])[:3]
        return f"{indent}[Table: {w} columns, Column Header: {ch}, Row Header: {rh}]\n\n"
    if kind == "table_row":
        cells = (text or "").split("|")
        return f"{indent}| {' | '.join(cells)} |\n"
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
    # value-typed properties: name in `text`, value in `media_ref`
    # (templates mirror to_markdown_parser.py:95-192)
    name = text or kind.removeprefix("prop_")
    v = media_ref
    if v is None or v == "":
        return None
    if kind == "prop_checkbox":
        return f"**{name}**: {'✅' if v == 'true' else '❌'}\n"
    if kind == "prop_date":
        parts = v.split("/")
        if len(parts) == 2:
            return f"**{name}**: {_format_date(parts[0])} - {_format_date(parts[1])}\n"
        return f"**{name}**: {_format_date(v)}\n"
    if kind in ("prop_created_time", "prop_last_edited_time"):
        return f"**{name}**: {_format_date(v)}\n"
    if kind in ("prop_email", "prop_phone_number", "prop_number", "prop_formula"):
        return f"**{name}**: {v}\n"
    if kind == "prop_select":
        return f"**{name}**: #{v}\n"
    if kind == "prop_multi_select":
        tags = " ".join(f"#{t}" for t in v.split(",") if t)
        return f"**{name}**: {tags}\n"
    if kind == "prop_status":
        return f"**{name}**: {v}\n"
    if kind == "prop_people":
        return f"**{name}**: {', '.join(p for p in v.split(',') if p)}\n"
    if kind == "prop_files":
        links = ", ".join(f"[{u.rsplit('/', 1)[-1]}]({u})" for u in v.split(",") if u)
        return f"**{name}**: {links}\n"
    if kind == "prop_rollup":
        fn, _, val = v.partition(":")
        return f"**{name}**: {fn}: {val or 'N/A'}\n"
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
        elif kind in EXCLUDED_PROP_KINDS:
            continue  # config.yaml:22-28 exclusions render nothing
        else:
            body += _render_block(kind, s.get("text"), s.get("media_ref"), s.get("offset") or 0)
    header = f"###Properties:\n{props}" if props else ""
    return header + body


@F.pandas_udf(T.StringType())
def render_spans(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for spans_series in it:
        yield spans_series.map(render_spans_py)
