"""Text analysis over document corpora — language ID, quality scoring,
token counting, fingerprinting (driver-mandated training-data extensions).

Everything here is a NATIVE column expression (JVM, whole-stage codegen):
these run per document over 10^12 rows, so no Python may touch the hot
path. Each has a clean SQL equivalent for DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# a tiny embedded English stopword list — deterministic, oracle-friendly
EN_STOPWORDS = [
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that",
]


def tokens_col(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(tokens_col(text)))


def token_count_from(text: Column, toks: Column) -> Column:
    """``token_count`` over a PRE-COMPUTED token array column.

    The ``*_from`` family exists so a query computing several metrics can
    stage ``tokens_col`` ONCE per row and share the array: the plain
    forms inline the split() into every metric, and array higher-order
    lambdas evaluate interpreted (outside codegen, no subexpression
    elimination), so each metric re-tokenized the document. Expressions
    are otherwise identical — results are bit-for-bit the same."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(toks))


def stopword_count_from(toks: Column) -> Column:
    # isin compiles to an InSet hash probe per token; the previous
    # array_contains scanned the 20-element literal array per token.
    # Identical booleans for the (never-null) token inputs.
    return F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))


def stopword_ratio_from(toks: Column, n_stop: Column | None = None) -> Column:
    n_stop = stopword_count_from(toks) if n_stop is None else n_stop
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    return stopword_ratio_from(tokens_col(text))


def ascii_ratio_col(text: Column) -> Column:
    return F.when(
        F.length(text) > 0,
        F.length(F.regexp_replace(text, "[^a-zA-Z0-9 .,!?;:'\"-]", "")) / F.length(text),
    ).otherwise(F.lit(0.0))


def lang_id_from(
    stop_ratio: Column, ascii_ratio: Column, en_threshold: float = 0.05
) -> Column:
    return (
        F.when((stop_ratio >= en_threshold) & (ascii_ratio >= 0.9), F.lit("en"))
        .when(ascii_ratio >= 0.9, F.lit("latin-other"))
        .otherwise(F.lit("unknown"))
    )


def lang_id(text: Column, en_threshold: float = 0.05) -> Column:
    """n-gram-free heuristic: English iff stopword ratio clears a floor AND
    the text is dominated by ASCII letters."""
    return lang_id_from(stopword_ratio(text), ascii_ratio_col(text), en_threshold)


def avg_token_len_from(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def avg_token_len(text: Column) -> Column:
    return avg_token_len_from(tokens_col(text))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    return F.when(F.length(text) > 0, n_punct / F.length(text)).otherwise(F.lit(0.0))


def quality_score_from(
    n: Column, tok_len: Column, stop_ratio: Column, p_ratio: Column
) -> Column:
    """``quality_score`` over pre-computed per-row metrics (see the
    ``*_from`` rationale on token_count_from)."""
    len_ok = F.when((n >= 10) & (n <= 100000), F.lit(1.0)).otherwise(
        F.least(n / F.lit(10.0), F.lit(1.0))
    )
    tok_ok = F.when((tok_len >= 2.0) & (tok_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.3))
    stop_ok = F.least(stop_ratio / F.lit(0.05), F.lit(1.0))
    punct_ok = F.when(p_ratio <= 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_ok * 0.4 + tok_ok * 0.2 + stop_ok * 0.2 + punct_ok * 0.2), 6)


def quality_score(text: Column) -> Column:
    """[0,1] heuristic quality: enough tokens, sane token length, some
    stopwords (fluent prose), bounded punctuation. Mirrors the shape of
    Gopher/C4-style quality rules; weights are engine-defined."""
    return quality_score_from(
        token_count(text), avg_token_len(text), stopword_ratio(text), punct_ratio(text)
    )


def doc_fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint: md5 of whitespace-normalized,
    lower-cased text (content addressing for exact dedup across sources)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def rolling_hash(text: Column, base: int = 31, mod: int = (1 << 61) - 1) -> Column:
    """Polynomial rolling hash over tokens (order-sensitive fingerprint):
    h = Σ h*base + xxhash64(token) (mod 2^61−1), folded natively."""
    toks = tokens_col(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, t: (acc * base + F.abs(F.xxhash64(t)).cast("decimal(38,0)")) % F.lit(mod).cast("decimal(38,0)"),
        lambda acc: acc.cast("long"),
    )


# Deliberately conservative patterns that mean the same thing to Java's
# regex engine (Spark) and RE2 (DuckDB): character classes, bounded
# quantifiers and \b only — no lookaround, no backrefs. Case-insensitivity
# is spelled as explicit A-Z ranges (not (?i)) so the pattern string is
# byte-identical in both engines' oracles.
PII_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_PHONE_RE = r"\b555-[0-9]{4}\b"


def redact_pii(text: Column) -> Column:
    """Native two-pass PII scrub (emails then phone-shaped tokens) —
    regexp_replace stays inside whole-stage codegen, so redaction is a
    pure projection: no shuffle, no Python, safe to fuse with the scan.
    Emails first: the placeholders contain no digits, so the passes
    cannot interact."""
    return F.regexp_replace(
        F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )


def pii_email_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), 0)).cast("long")


def pii_phone_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PII_PHONE_RE), 0)).cast("long")
