"""Token-budget sentence-aware chunking (W5) + markdown cleaning (P10).

Behavioral contract pinned by the reference's golden tests
(tests/test_processors/content_chunker_end_embedder_test.py:49-120) against
graph_rag/processor/content_chunker_and_embedder.py:
  - constant header "Title: {t}\nLast edited time: {ts}\n" (+ "\nContent:\n"
    for content chunks) prepended to every chunk; its token count reduces
    the per-chunk budget (:49-60,123-129)
  - sentence-aware window: take `available` tokens, snap back to the last
    . ? ! or newline, emit, advance by emitted-size − overlap; overlap is
    skipped when the budget ≤ overlap (:90-121)
  - a page with no content chunks gets a single metadata chunk (:58-60)
  - char-based variant with binary-search chunk end (:62-88)
  - markdown cleaner: headings → sentences, strip special chars, collapse
    whitespace (:17-27)

Tokenizer: deterministic whitespace tokenizer by default (hermetic — the
reference's own tests mock tiktoken to exactly this, :46-47); tiktoken is
used when importable and a model name is passed.

The chunker is a per-document sequential fold (each window depends on the
previous cut) — parallelism is across documents, inside one Arrow batch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class WhitespaceTokenizer:
    """encode/decode/count over whitespace tokens — deterministic, hermetic."""

    def encode(self, text: str) -> list[str]:
        return text.split()

    def decode(self, tokens: list[str]) -> str:
        return " ".join(tokens)

    def count(self, text: str) -> int:
        return len(text.split())


def get_tokenizer(model_name: str | None = None):
    """tiktoken when available and requested; whitespace otherwise."""
    if model_name:
        try:
            import tiktoken

            try:
                enc = tiktoken.encoding_for_model(model_name)
            except KeyError:
                enc = tiktoken.get_encoding("cl100k_base")

            class _Tik:
                def encode(self, text):
                    return enc.encode(text, disallowed_special=())

                def decode(self, tokens):
                    return enc.decode(tokens)

                def count(self, text):
                    return len(enc.encode(text, disallowed_special=()))

            return _Tik()
        except ImportError:
            pass
    return WhitespaceTokenizer()


_PUNCT = (".", "?", "!", "\n")


def sentence_aware_chunks(
    content: str, available_tokens: int, overlap: int, tok=None
) -> list[str]:
    """Sliding token window snapped back to sentence boundaries."""
    tok = tok or WhitespaceTokenizer()
    if available_tokens <= overlap:
        overlap = 0
    if available_tokens <= 0:
        return []
    chunks: list[str] = []
    tokens = tok.encode(content)
    while tokens:
        window_text = tok.decode(tokens[:available_tokens])
        cut = max(window_text.rfind(p) for p in _PUNCT)
        if cut != -1:
            window_text = window_text[: cut + 1]
        if window_text and not window_text.isspace():
            chunks.append(window_text)
        emitted = tok.count(window_text)
        if emitted >= len(tokens):
            break
        advance = emitted - overlap
        # guard against a stall when the snap-back emitted ≤ overlap tokens
        tokens = tokens[advance:] if advance > 0 else tokens[1:]
    return chunks


def char_chunks(content: str, available_tokens: int, overlap: int, tok=None) -> list[str]:
    """Char-based variant: binary-search the longest prefix within budget."""
    tok = tok or WhitespaceTokenizer()
    chunks: list[str] = []
    start = 0
    while content and start < len(content):
        end = _chunk_end(content, start, available_tokens, tok)
        chunks.append(content[start:end])
        if end == len(content):
            break
        start = max(end - overlap, start + 1)
    return chunks


def _chunk_end(content: str, start: int, available_tokens: int, tok) -> int:
    # NB: the lower bound doubles as the counted slice's start — a quirk of
    # the reference's search (content_chunker_and_embedder.py:76-88) that
    # its golden tests bake in, so it is preserved behaviorally here.
    lo, hi = start, len(content)
    while lo <= hi:
        mid = (lo + hi) // 2
        if tok.count(content[lo:mid]) <= available_tokens:
            if mid == hi or tok.count(content[lo : mid + 1]) > available_tokens:
                return mid
            lo = mid + 1
        else:
            hi = mid - 1
    return lo


def chunk_header(title: str, last_edited_time: str | None) -> str:
    return f"Title: {title}\nLast edited time: {last_edited_time}\n"


def create_chunks(
    title: str,
    last_edited_time: str | None,
    content: str | None,
    chunk_size: int,
    overlap: int,
    tok=None,
) -> list[str]:
    """Header-prefixed sentence-aware chunks; metadata-only chunk fallback."""
    tok = tok or WhitespaceTokenizer()
    header = chunk_header(title, last_edited_time)
    const = f"{header}\nContent:\n"
    available = chunk_size - tok.count(const)
    body = sentence_aware_chunks(content or "", available, overlap, tok)
    if body:
        return [f"{const}{c}" for c in body]
    return [header]


# ---- markdown cleaner (P10) -------------------------------------------------
_HEADING_RE = re.compile(r"^#+\s*(.*?)$", flags=re.MULTILINE)
_SPECIAL_RE = re.compile(r"[^a-zA-Z0-9\s.,!?;:/+\-]")
_WS_RE = re.compile(r"\s+")


def clean_markdown_py(text: str) -> str:
    text = _HEADING_RE.sub(r"\1.", text)
    text = _SPECIAL_RE.sub("", text)
    return _WS_RE.sub(" ", text).strip()


def clean_markdown_col(col):
    """Same cleaner as a native (JVM, codegen'd) column expression."""
    from pyspark.sql import functions as F

    c1 = F.regexp_replace(col, r"(?m)^#+[ \t]*(.*?)$", "$1.")
    c2 = F.regexp_replace(c1, r"[^a-zA-Z0-9\s.,!?;:/+\-]", "")
    return F.trim(F.regexp_replace(c2, r"\s+", " "))
