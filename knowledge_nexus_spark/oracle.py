"""Pure-Python reference-semantics oracle (SURVEY.md §7 step 1).

Replays the reference pipeline's rules imperatively — dict of pages,
list of per-encounter relation appends, freshness gate, orphan handling —
over the same span corpus the Spark engine consumes, producing the
expected node set and the expected distinct (subj, pred, obj) set
("post-MERGE" semantics: Neo4j MERGE dedups at the sink,
neo4j_manager.py:230-238, while the ingest appends duplicates,
notion_provider.py:169).

This is intentionally a SECOND, independent implementation of the rules
(single-process, row-at-a-time, like the reference) so the vectorized
Spark path is tested against it rather than against itself. P/R ≥ 0.95
per BASELINE.json; at test scale the match must be exact.

Config defaults mirror config/config.yaml:16-18:
  add_archived_page_nodes=False, add_removed_page_nodes=False,
  create_unprocessed_graph_nodes=False.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from datetime import datetime

# Independent regexes (same semantics as the reference's, written fresh).
_LINK = re.compile(r"\[(?P<anchor>[^\]]*)\]\((?P<href>[^)]+)\)")
_HREF = re.compile(
    r"(?:https://www\.notion\.so)?/"
    r"(?:[A-Za-z0-9-]+/)?(?:[A-Za-z0-9-]+-)?"
    r"([a-f0-9]{8}-?[a-f0-9]{4}-?[a-f0-9]{4}-?[a-f0-9]{4}-?[a-f0-9]{12})"
)
_DASHED = re.compile(r"^\w{8}-\w{4}-\w{4}-\w{4}-\w{12}$")

RICH = {
    "paragraph", "heading_1", "heading_2", "heading_3", "bulleted_list_item",
    "numbered_list_item", "to_do", "toggle", "code", "quote", "callout", "template",
}
URLISH = {"bookmark", "embed", "link_preview"}


def _norm(v: str) -> str:
    return v.replace("-", "") if _DASHED.match(v) else v


def _uuid_of(href: str) -> str | None:
    m = _HREF.match(href)
    return m.group(1).replace("-", "") if m else None


def _parse_ts(t: str) -> datetime:
    return datetime.strptime(t, "%Y-%m-%dT%H:%M:%S.%fZ")


@dataclass
class OracleConfig:
    add_archived: bool = False
    add_removed: bool = False
    create_unprocessed: bool = False
    root_id: str | None = None  # root-scoped traversal (the reference's main mode)
    max_depth: int = 200  # BFS hop cap (stands in for page_max_depth)
    follow_references: bool = True  # recursive_process_reference_pages


@dataclass
class OracleResult:
    pages: dict = field(default_factory=dict)  # id -> node dict
    relations: list = field(default_factory=list)  # per-encounter appends

    @property
    def triple_set(self) -> set:
        """Distinct (subj, pred, obj) — the P/R comparison set."""
        return {(s, p, o) for (s, p, o, _c) in self.relations}

    @property
    def edge_set(self) -> set:
        """Distinct (subj, pred, obj, context) — MERGE key incl. context
        (the Cypher MERGE pattern carries {context}, neo4j_manager.py:234)."""
        return {(s, p, o, c if c else "") for (s, p, o, c) in self.relations}


def run_oracle(corpus_rows: list[dict], cfg: OracleConfig | None = None) -> OracleResult:
    cfg = cfg or OracleConfig()
    res = OracleResult()

    # ---- freshness last-writer-wins over duplicate versions ------------
    # (notion_provider.py:315-319: an already-prepared page is replaced
    # only by a strictly newer last_edited_time)
    # EQUAL timestamps: which version wins is implementation-defined — the
    # oracle keeps its first-encountered row, Spark's window tie-breaks on
    # a content hash; the corpus generator never emits equal timestamps.
    latest: dict[str, dict] = {}
    for row in corpus_rows:
        did = _norm(row["doc_id"])
        prev = latest.get(did)
        if prev is None or _parse_ts(row["last_edited_time"]) > _parse_ts(prev["last_edited_time"]):
            latest[did] = row

    def emit(subj, pred, obj, ctx=None):
        res.relations.append((_norm(subj), pred, _norm(obj), ctx))

    def emit_rich(doc_id, text, prefix=None):
        matches = list(_LINK.finditer(text))
        if not matches:
            return
        plain = _LINK.sub(lambda m: m.group("anchor"), text)
        ctx = f"{prefix}\n{plain}" if prefix else plain
        for m in matches:
            href = m.group("href")
            uid = _uuid_of(href)
            if uid:
                emit(doc_id, "REFERENCES", uid, ctx)
            else:
                emit(doc_id, "REFERENCES", href, ctx)
                add_bookmark(href)

    def add_bookmark(url: str):
        if url in res.pages:
            return  # first encounter wins (notion_provider.py:289-296)
        res.pages[url] = {
            "id": url,
            "title": "Web " + hashlib.md5(url.encode()).hexdigest()[:8],
            "type": "Bookmark",
            "url": url,
            "content": f"Meta description for {url}",
            "source": "Web",
            "last_edited_time": None,
        }

    # ---- document selection: corpus scan (notion_provider.py:93-102) or
    # root-scoped BFS (the reference's recursive traversal :124-164,
    # REFERENCES recursion gated by config :170-171, depth cap :130-135) --
    if cfg.root_id is not None:
        selected = _bfs_reachable(latest, cfg)
    else:
        selected = list(latest.keys())

    # ---- per-document walk (archived/in-trash gates from the discovery
    # path :394-412 applied uniformly → traversal-order independent) -----
    for did in selected:
        row = latest[did]
        if row["archived"] and not cfg.add_archived:
            continue
        if row["in_trash"] and not cfg.add_removed:
            continue
        title = row["title"]
        if row["archived"]:
            title = f"[ARCHIVED] {title}"
        elif row["in_trash"]:
            title = f"[REMOVED] {title}"
        res.pages[did] = {
            "id": did,
            "title": title,
            "type": "Database" if row["doc_kind"] == "database" else "Page",
            "url": row["url"],
            "content": None,
            "source": "Notion",
            "last_edited_time": row["last_edited_time"],
        }
        if row["archived"] or row["in_trash"]:
            continue  # node kept (if configured) but content never processed

        for s in row["spans"] or []:
            kind, text, ref = s["kind"], s.get("text") or "", s.get("media_ref")
            if kind in ("child_page", "child_database") and ref:
                emit(did, "CONTAINS", ref)
            elif kind == "link_to_page" and ref:
                emit(did, "REFERENCES", ref)
            elif kind in URLISH and ref:
                emit(did, "REFERENCES", ref)
                add_bookmark(ref)
            elif kind in RICH:
                emit_rich(did, text)
            elif kind == "rich_runs":
                # P5 annotated runs: objects from run hrefs, context = the
                # annotation-free plain concat; non-uuid hrefs bookmark
                # (same rule as emit_rich's else branch)
                import json as _json

                try:
                    runs = _json.loads(text) if text else []
                except ValueError:
                    runs = []
                plain = "".join((rt.get("plain_text") or "") for rt in runs)
                for rt in runs:
                    href = rt.get("href")
                    if not href:
                        continue
                    uid = _uuid_of(href)
                    if uid:
                        emit(did, "REFERENCES", uid, plain)
                    else:
                        emit(did, "REFERENCES", href, plain)
                        add_bookmark(href)
            elif kind == "prop_relation" and ref:
                emit(did, "REFERENCES", ref, f"Relation property **{text or 'Relation'}**")
            elif kind == "prop_url" and ref:
                emit(did, "REFERENCES", ref, f"Url property **{text or 'URL'}**")
                add_bookmark(ref)
            elif kind == "prop_rich_text":
                emit_rich(did, text, f"Text property **{ref or 'Name'}**:")
            elif kind == "prop_title":
                emit_rich(did, text, f"Title property **{ref or 'Name'}**:")

    # ---- orphan handling (graph_builder.py:28-32) ----------------------
    if cfg.create_unprocessed:
        # add_missing_pages (graph_builder.py:34-61): endpoint not in pages
        # → Unprocessed node, source inherited from the opposite endpoint
        for (s, _p, o, _c) in list(res.relations):
            if s not in res.pages:
                src = res.pages[o]["source"] if o in res.pages else "Unknown"
                res.pages[s] = _unprocessed(s, src)
            if o not in res.pages:
                src = res.pages[s]["source"] if s in res.pages else "Unknown"
                res.pages[o] = _unprocessed(o, src)
    else:
        # clean_orphan_relations (graph_builder.py:78-85)
        res.relations = [
            r for r in res.relations if r[0] in res.pages and r[2] in res.pages
        ]
    return res


def _link_targets(row: dict, follow_references: bool) -> set:
    """Normalized corpus-candidate targets a doc's content links to —
    the discovery edge set for root-scoped BFS."""
    out = set()
    if row["archived"] or row["in_trash"]:
        return out  # content never processed → nothing discovered
    for s in row["spans"] or []:
        kind, text, ref = s["kind"], s.get("text") or "", s.get("media_ref")
        if kind in ("child_page", "child_database") and ref:
            out.add(_norm(ref))
        elif not follow_references:
            continue
        elif kind == "link_to_page" and ref:
            out.add(_norm(ref))
        elif kind == "prop_relation" and ref:
            out.add(_norm(ref))
        elif kind in RICH or kind in ("prop_rich_text", "prop_title"):
            for m in _LINK.finditer(text):
                uid = _uuid_of(m.group("href"))
                if uid:
                    out.add(uid)
        elif kind == "rich_runs":
            import json as _json

            try:
                runs = _json.loads(text) if text else []
            except ValueError:
                runs = []
            for rt in runs:
                href = rt.get("href")
                uid = _uuid_of(href) if href else None
                if uid:
                    out.add(uid)
    return out


def _bfs_reachable(latest: dict, cfg: OracleConfig) -> list:
    root = _norm(cfg.root_id)
    if root not in latest:
        return []
    visited = {root}
    frontier = [root]
    order = [root]
    for _depth in range(cfg.max_depth):
        nxt = []
        for did in frontier:
            for tgt in sorted(_link_targets(latest[did], cfg.follow_references)):
                if tgt in latest and tgt not in visited:
                    visited.add(tgt)
                    nxt.append(tgt)
        if not nxt:
            break
        order.extend(nxt)
        frontier = nxt
    return order


def _unprocessed(page_id: str, source: str) -> dict:
    return {
        "id": page_id,
        "title": "Unprocessed",
        "type": "Page",
        "url": "",
        "content": None,
        "source": source,
        "last_edited_time": None,
    }
