"""JSONL (newline-delimited JSON) corpus connector with corrupt-record
quarantine — the standard shape for web-scale text drops.

The reference ingests via per-page API calls
(/root/reference/graph_rag/data_source/notion_provider.py:60-108); a
100 TB corpus arrives instead as millions of JSONL part files. The
connector applies the two non-negotiable scale rules:

- NEVER infer schema (an extra full pass over 100 TB, and a schema that
  drifts with the sample): the expected schema is explicit;
- NEVER drop malformed lines silently: malformed lines land in a
  quarantine frame carrying the raw line for triage.

Implementation note: Spark's native json reader forbids queries whose
referenced columns are only the internal corrupt-record column
(UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) unless the scan
is cached first — a non-starter at 100 TB. Reading as text and parsing
with ``from_json`` sidesteps the restriction: the parse is a plain JVM
expression, both branches stay scan+filter, and the corrupt marker is an
ordinary struct field. JSONL is line-oriented, so the text scan reads
exactly the same bytes the json scan would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOC_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean, quarantine) for a JSONL drop at ``path``.

    clean: rows parsed against ``schema``.
    quarantine: (raw STRING) — the verbatim malformed lines.

    ``from_json`` in PERMISSIVE mode fills the corrupt field with the raw
    line on parse failure and leaves it null on success, which is how the
    split distinguishes malformed lines from legitimately-null fields.
    Blank / whitespace-only / literal-``null`` lines are a third case:
    ``from_json`` returns a NULL struct (no corrupt marker at all), so
    the clean branch also requires the struct itself to be non-null —
    otherwise such lines would pass as all-null document rows.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = spark.read.text(path).select(
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("j"),
        F.col("value"),
    )
    ok = F.col("j").isNotNull() & F.col(f"j.{CORRUPT_COL}").isNull()
    clean = parsed.filter(ok).select(
        *[F.col(f"j.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.filter(~ok).select(F.col("value").alias("raw"))
    return clean, quarantine
