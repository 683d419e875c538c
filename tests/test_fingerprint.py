"""Winnowing fingerprints (operators/fingerprint): pinned against an
independent pure-Python reference implementation, plus the two paper
guarantees (density, shared-run coverage). Cross-engine value equality
is covered by the driver oracle (text_fingerprint)."""

from __future__ import annotations

import hashlib

import pytest

from knowledge_nexus_spark.operators.fingerprint import (
    K_SHINGLE,
    W_WINDOW,
    fingerprint_summary,
    winnow_fingerprints,
)


def _py_md5_hash64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int = K_SHINGLE, w: int = W_WINDOW) -> set[int]:
    toks = text.strip().lower().split()
    if len(toks) < k:
        return set()
    hashes = [
        _py_md5_hash64(" ".join(toks[i : i + k]))
        for i in range(len(toks) - k + 1)
    ]
    last_start = max(len(hashes) - w, 0)
    return {min(hashes[i : i + w]) for i in range(last_start + 1)}


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "a b"),  # < k tokens: no fingerprints defined
    (3, "alpha beta gamma"),  # exactly one shingle -> one fingerprint
    (4, "one two three four five six"),  # n_sh < w -> single window
    (5, "  Mixed   CASE    and   extra whitespace   handling here too  "),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_pure_python_reference(spark, docs_df):
    got = {
        (r["doc_id"], r["fp"])
        for r in winnow_fingerprints(docs_df, "doc_id", "text").collect()
    }
    want = {(i, fp) for i, t in DOCS for fp in _py_winnow(t)}
    assert got == want


def test_summary_checksums(spark, docs_df):
    rows = {
        r["doc_id"]: r
        for r in fingerprint_summary(docs_df, "doc_id", "text").collect()
    }
    assert 2 not in rows  # sub-k doc excluded
    for i, t in DOCS:
        fps = _py_winnow(t)
        if not fps:
            continue
        assert rows[i]["n_fps"] == len(fps)
        assert rows[i]["fp_min"] == min(fps)
        assert rows[i]["fp_max"] == max(fps)
        assert rows[i]["fp_check"] == sum(fp % 1_000_003 for fp in fps)


def test_shared_run_guarantee(spark):
    """Any two docs sharing a token run of length >= w+k-1 must share at
    least one fingerprint (the winnowing coverage theorem)."""
    run = " ".join(f"tok{i}" for i in range(W_WINDOW + K_SHINGLE - 1))
    df = spark.createDataFrame(
        [
            (1, f"completely unrelated prefix words {run} and a suffix"),
            (2, f"{run} different tail entirely here"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df, "doc_id", "text").collect()
    s1 = {r["fp"] for r in fps if r["doc_id"] == 1}
    s2 = {r["fp"] for r in fps if r["doc_id"] == 2}
    assert s1 & s2


def test_density_bound(spark):
    """Selected fingerprints are a sparse subset: at most the number of
    window starts, and empirically near the 2/(w+1) expected density."""
    text = " ".join(f"w{(i * 7919) % 5000}" for i in range(2000))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n_fps = winnow_fingerprints(df, "doc_id", "text").count()
    n_hashes = 2000 - K_SHINGLE + 1
    assert n_fps <= n_hashes - W_WINDOW + 1
    expected = 2.0 / (W_WINDOW + 1) * n_hashes
    assert 0.4 * expected <= n_fps <= 2.0 * expected


def test_zero_shuffle_plan(spark, docs_df):
    """The whole operator is a per-row array program: no exchange, no
    window, no aggregation operator — one codegen projection pipeline.
    The stacked Projects must also survive CollapseProject (each array
    stays materialised instead of being inlined into a lambda body where
    it would be re-evaluated per element)."""
    plan = fingerprint_summary(docs_df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan
    assert "Aggregate" not in plan, plan


def test_explode_path_has_no_inlined_filter(spark, docs_df):
    """Regression guard: with a plain explode, InferFiltersFromGenerate +
    predicate pushdown inline the whole winnowing array program into a
    Filter whose window-min lambda re-evaluates the shingle-hash
    transform per position (quadratic per doc — a 2k-token doc went
    from ms to minutes). explode_outer blocks the inference; the only
    Filter left must be the cheap sub-k token gate (no array_min)."""
    plan = winnow_fingerprints(docs_df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Filter" in line:
            assert "array_min" not in line, line


def test_arrow_winnow_bit_identical_to_native(spark):
    """r6 optimization pin: the Arrow winnow engine (hashlib md5 + numpy
    sliding minima) must produce EXACTLY the native array-expression
    summary — same integers, same rows — including whitespace edge
    cases (leading tab survives the spaces-only trim and yields an
    empty first token in both tokenizers)."""
    from knowledge_nexus_spark.operators.fingerprint import (
        fingerprint_summary,
        fingerprint_summary_arrow,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    edge = spark.createDataFrame(
        [
            (9001, "\talpha beta gamma delta epsilon zeta"),
            (9002, "  spaced   out\ttokens\nnewlines here too  "),
            (9003, "ab"),                    # sub-k: excluded by both
            (9004, "one two three"),         # exactly k tokens
            (9005, ""),                      # empty
        ],
        ["doc_id", "text"],
    )
    both = docs.select("doc_id", "text").unionByName(edge)
    a = {
        r.doc_id: (r.n_fps, r.fp_min, r.fp_max, r.fp_check)
        for r in fingerprint_summary(both, "doc_id", "text").collect()
    }
    b = {
        r.doc_id: (r.n_fps, r.fp_min, r.fp_max, r.fp_check)
        for r in fingerprint_summary_arrow(both, "doc_id", "text").collect()
    }
    assert a == b and len(a) > 0
