"""Deterministic synthetic interleaved-span document corpus.

Mirrors the Notion block distribution consumed by the reference
(/root/reference/graph_rag/data_source/notion_provider.py:181-263 block
kinds; :337-387 property kinds) as the BASELINE.json ``input_hint`` table:

    documents(doc_id STRING,
              spans ARRAY<STRUCT<kind STRING, text STRING,
                                 media_ref STRING, offset INT>>)

plus document-header columns (title, doc_kind, url, archived, in_trash,
last_edited_time) that the reference reads from the page metadata
(notion_provider.py:96-100,322-323,394-399).

Everything is seeded and wall-clock-free: doc *i* is generated from
``Random(seed << 20 | i)``, so generation is embarrassingly parallel —
the Spark path generates each partition's documents on executors via
``mapInPandas`` with no driver-side materialization, which is the shape
that scales to 10^12 documents (each task owns an id range).

Skew is generated on purpose: doc 0 is a hub referenced by a large
fraction of the corpus (the reference's root page has the same property —
every child emits CONTAINS to it, notion_provider.py:144-150), so the
downstream groupBys/joins exercise the salting paths.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from knowledge_nexus_spark.schema import DOCUMENTS_SCHEMA

WORDS = (
    "graph knowledge spark table page note idea link index query plan vector "
    "embed chunk merge node edge alias entity mention title corpus shuffle "
    "partition salt skew join scan filter window batch stream source sink"
).split()

_EXTERNAL_HOSTS = ["example.com", "blog.example.org", "docs.example.net"]


def doc_uuid(i: int) -> str:
    """Deterministic 32-hex id for corpus doc *i* (Notion-style undashed)."""
    return hashlib.md5(f"knx-doc-{i}".encode()).hexdigest()


def missing_uuid(j: int) -> str:
    """A uuid guaranteed not to collide with any corpus doc."""
    return hashlib.md5(f"knx-missing-{j}".encode()).hexdigest()


def dash(u: str) -> str:
    return f"{u[:8]}-{u[8:12]}-{u[12:16]}-{u[16:20]}-{u[20:]}"


def notion_url(u: str, rng: random.Random) -> str:
    """One of the URL shapes _extract_notion_uuid accepts (notion_provider.py:18-27)."""
    shape = rng.randrange(3)
    if shape == 0:
        return f"https://www.notion.so/user{rng.randrange(4)}/Some-Page-{dash(u)}"
    if shape == 1:
        return f"https://www.notion.so/{u}"
    return f"https://www.notion.so/Page-{dash(u)}?pvs=4"


def external_url(rng: random.Random) -> str:
    host = _EXTERNAL_HOSTS[rng.randrange(len(_EXTERNAL_HOSTS))]
    # small id space on purpose → repeated URLs across docs exercise
    # bookmark identity-by-URL merging (notion_provider.py:288-296)
    return f"https://{host}/p/{rng.randrange(200)}"


def _words(rng: random.Random, lo: int = 4, hi: int = 14) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(lo, hi)))


def _ts(i: int, version: int = 0) -> str:
    """ISO-8601 with fractional seconds ("%Y-%m-%dT%H:%M:%S.%fZ",
    notion_provider.py:56). Deterministic, strictly ordered by (i, version)."""
    day = 1 + (i // 86400) % 27
    sec = i % 86400
    h, rem = divmod(sec, 3600)
    m, s = divmod(rem, 60)
    return f"2024-01-{day:02d}T{h:02d}:{m:02d}:{s:02d}.{version:03d}000Z"


@dataclass(frozen=True)
class CorpusConfig:
    n_docs: int = 200
    seed: int = 42
    database_rate: float = 0.08
    archived_rate: float = 0.03
    trash_rate: float = 0.02
    dangling_rate: float = 0.05  # references to uuids outside the corpus
    dup_rate: float = 0.03  # docs that also emit a stale older version
    hub_rate: float = 0.25  # P(doc links to hub doc 0) → hot-key skew


def _internal_target(rng: random.Random, i: int, cfg: CorpusConfig) -> str:
    """Pick a reference target: mostly near neighbors, hub, or dangling."""
    r = rng.random()
    if r < cfg.dangling_rate:
        return missing_uuid(rng.randrange(max(cfg.n_docs // 10, 4)))
    if r < cfg.dangling_rate + cfg.hub_rate:
        return doc_uuid(0)
    return doc_uuid((i + rng.randint(1, 20)) % cfg.n_docs)


def _rich_text_with_links(rng: random.Random, i: int, cfg: CorpusConfig) -> str:
    """Plain words, optionally with embedded markdown links.

    Internal links use the Notion URL shapes so _extract_notion_uuid-style
    extraction fires; external links become bookmark references
    (notion_provider.py:265-286)."""
    parts = [_words(rng)]
    for _ in range(rng.choices([0, 1, 2], weights=[62, 30, 8])[0]):
        anchor = _words(rng, 1, 3)
        if rng.random() < 0.7:
            href = notion_url(_internal_target(rng, i, cfg), rng)
        else:
            href = external_url(rng)
        parts.append(f"[{anchor}]({href})")
        parts.append(_words(rng, 1, 6))
    return " ".join(parts)


def gen_doc_rows(i: int, cfg: CorpusConfig) -> list[dict]:
    """All rows for corpus doc *i* (1 current version + maybe 1 stale dup).

    Returns plain dicts matching DOCUMENTS_SCHEMA. Pure function of
    (i, cfg) — usable from Spark executors and from the driver-side
    oracle alike."""
    rng = random.Random((cfg.seed << 20) | i)
    u = doc_uuid(i)
    is_db = i != 0 and rng.random() < cfg.database_rate
    archived = i != 0 and rng.random() < cfg.archived_rate
    in_trash = i != 0 and not archived and rng.random() < cfg.trash_rate
    title = f"Doc {i} {rng.choice(WORDS)}"
    spans: list[dict] = []

    def span(kind: str, text: str | None = None, media_ref: str | None = None, offset: int = 0):
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": offset})

    if is_db:
        # a Notion database: children fetched via get_all_database_items
        # (notion_provider.py:141-150) → child_page spans
        for _ in range(rng.randint(2, 8)):
            tgt = _internal_target(rng, i, cfg)
            span("child_page", f"DB row {_words(rng, 1, 3)}", tgt)
    else:
        # property spans first (recursive_process_page_properties order,
        # notion_provider.py:337-387)
        if rng.random() < 0.35:
            span("prop_title", title, None)
        if rng.random() < 0.25:
            span("prop_relation", "Related", _internal_target(rng, i, cfg))
        if rng.random() < 0.20:
            span("prop_rich_text", _rich_text_with_links(rng, i, cfg), None)
        if rng.random() < 0.15:
            span("prop_url", "Source", external_url(rng))

        n_body = rng.randint(4, 28)
        for _ in range(n_body):
            k = rng.random()
            depth = rng.choices([0, 1, 2], weights=[70, 22, 8])[0]
            if k < 0.42:
                span("paragraph", _rich_text_with_links(rng, i, cfg), None, depth)
            elif k < 0.50:
                span(f"heading_{rng.randint(1, 3)}", _words(rng, 2, 6), None, 0)
            elif k < 0.58:
                span("bulleted_list_item", _rich_text_with_links(rng, i, cfg), None, depth)
            elif k < 0.63:
                span("numbered_list_item", _words(rng), None, depth)
            elif k < 0.67:
                span("to_do", _words(rng), "checked" if rng.random() < 0.5 else "unchecked", depth)
            elif k < 0.70:
                span("quote", _words(rng), None, depth)
            elif k < 0.73:
                span("code", _words(rng, 3, 8), "python", depth)
            elif k < 0.76:
                span("callout", _words(rng), "bulb", depth)
            elif k < 0.80:
                kind = rng.choice(["child_page", "child_database"])
                span(kind, f"Child {_words(rng, 1, 2)}", _internal_target(rng, i, cfg))
            elif k < 0.84:
                span("link_to_page", None, dash(_internal_target(rng, i, cfg))
                     if rng.random() < 0.5 else _internal_target(rng, i, cfg))
            elif k < 0.89:
                span(rng.choice(["bookmark", "embed", "link_preview"]),
                     _words(rng, 0, 3), external_url(rng))
            elif k < 0.95:
                span(rng.choice(["image", "video", "file", "pdf"]),
                     _words(rng, 0, 3), f"https://files.example.com/{rng.randrange(10000)}.bin")
            else:
                span(rng.choice(["divider", "table_of_contents", "breadcrumb"]), None, None, depth)

    row = {
        "doc_id": u,
        "title": title,
        "doc_kind": "database" if is_db else "page",
        "url": f"https://www.notion.so/{u}",
        "archived": archived,
        "in_trash": in_trash,
        "last_edited_time": _ts(i, version=1),
        "spans": spans,
    }
    rows = [row]
    if rng.random() < cfg.dup_rate:
        stale = dict(row)
        stale["last_edited_time"] = _ts(i, version=0)
        stale["title"] = f"{title} (stale)"
        stale["spans"] = spans[: max(1, len(spans) // 2)]
        rows.append(stale)
    return rows


def generate_documents(spark: SparkSession, cfg: CorpusConfig, partitions: int | None = None) -> DataFrame:
    """Distributed corpus generation: each task generates its own id range."""
    import pandas as pd  # executor-side import

    n_parts = partitions or max(spark.sparkContext.defaultParallelism, 4)
    base = spark.range(0, cfg.n_docs, numPartitions=min(n_parts, cfg.n_docs))

    def gen(batches):
        for pdf in batches:
            out: list[dict] = []
            for i in pdf["id"]:
                out.extend(gen_doc_rows(int(i), cfg))
            yield pd.DataFrame(out) if out else pd.DataFrame(
                {f.name: [] for f in DOCUMENTS_SCHEMA.fields}
            )

    return base.mapInPandas(gen, schema=DOCUMENTS_SCHEMA)


def generate_documents_local(cfg: CorpusConfig) -> list[dict]:
    """Driver-side corpus for the pure-Python oracle and small tests."""
    rows: list[dict] = []
    for i in range(cfg.n_docs):
        rows.extend(gen_doc_rows(i, cfg))
    return rows
