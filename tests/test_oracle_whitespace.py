"""Round-4 VERDICT #10: the Spark-vs-DuckDB tokenizer agreement
(F.split(…, '\\s+') vs regexp_split_to_array(…, '\\s+')) was exercised
only by convention — the driver corpus is single-space words. This test
feeds ADVERSARIAL whitespace (consecutive spaces, tabs, newlines, CRLF,
leading/trailing runs, whitespace-only and empty strings) through every
tokenizer-sensitive documents-table gate query and compares the two
engines with the same order-insensitive value hash the contract checker
uses. A divergence in empty-token handling or whitespace-class coverage
fails here with data, not in the driver's gate.

The driver testdata is read-only, so the corpus lives in a tmp sf_dir
with the same documents schema; the registry callables take sf_dir, so
the REAL gate plans run unmodified.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "check_contract", os.path.join(REPO, "tools", "check_contract.py")
)
_cc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_cc)

# Tokenizer-sensitive gates that read ONLY the documents table. kg_chunks
# is deliberately absent: its closed-form oracle documents a single-space
# corpus precondition (the chunker itself is whitespace-golden-tested in
# test_chunker.py).
QUERIES = [
    "text_stats",
    "text_lang",
    "text_quality",
    "text_ngrams",
    "text_repetition",
    "text_fingerprint",
    "kg_embed",
    "kg_gazetteer_mentions",
    "dedup_token_jaccard",
    "dedup_bigram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_perplexity",
]

ADVERSARIAL = [
    "plain single space words",
    "double  spaces   and    runs",
    "tab\tseparated\t\ttokens",
    "newline\nseparated\n\ntokens",
    "crlf\r\nline endings\r\n",
    "  leading and trailing  ",
    "\t\n mixed \t whitespace \n classes \r\n",
    "spark  join\tmerge\nquery",  # gazetteer words behind odd whitespace
    "",  # empty text
    "   ",  # whitespace-only
    "one",
    "repeat repeat  repeat\trepeat",
]


@pytest.fixture(scope="module")
def adversarial_sf(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("adversarial_sf"))
    rows = [
        (i, t, "en", "synthetic", len(t)) for i, t in enumerate(ADVERSARIAL)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    return sf


@pytest.mark.parametrize("name", QUERIES)
def test_gate_green_on_adversarial_whitespace(spark, adversarial_sf, name):
    from knowledge_nexus_spark.plans.driver_queries import ORACLE_SQL, QUERIES as Q

    got = Q[name](spark, adversarial_sf)
    got_rows = got.collect()
    got_cols = got.columns

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(adversarial_sf, 'documents.parquet')}/*.parquet'"
    )
    want = con.sql(ORACLE_SQL[name])
    want_rows = want.fetchall()
    want_cols = [d[0] for d in want.description]

    assert len(got_rows) == len(want_rows), (
        f"{name}: {len(got_rows)} spark rows vs {len(want_rows)} oracle"
    )
    assert sorted(got_cols) == sorted(want_cols), name
    gh = _cc.value_hash(got_rows, got_cols)
    wh = _cc.value_hash(want_rows, want_cols)
    assert gh == wh, f"{name}: value hash mismatch on adversarial whitespace"
