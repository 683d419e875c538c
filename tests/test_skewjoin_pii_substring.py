"""Round-4 curation additions: hot-key split join equality, PII
redaction, and substring-window dedup semantics — the adversarial
shapes the driver's generated tables never produce (empty hot list,
every-key-hot, boilerplate windows shared corpus-wide, PII at string
boundaries)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from knowledge_nexus_spark.functions.textstats import redact_pii
from knowledge_nexus_spark.operators.dedup import substring_window_pairs
from knowledge_nexus_spark.operators.skewjoin import skew_split_join

ROW = st.tuples(
    st.integers(min_value=0, max_value=5),  # key (small domain → hot keys)
    st.integers(min_value=0, max_value=99),  # payload
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(ROW, min_size=1, max_size=24),
    hot=st.lists(st.integers(min_value=0, max_value=5), max_size=6),
)
def test_skew_split_join_equals_plain_join(spark, rows, hot):
    fact = spark.createDataFrame(rows, "k int, v int")
    dim = fact.groupBy("k").agg(F.min("v").alias("mv"))
    got = {
        (r.k, r.v, r.mv)
        for r in skew_split_join(fact, dim, "k", list(set(hot))).collect()
    }
    want = {(r.k, r.v, r.mv) for r in fact.join(dim, "k").collect()}
    assert got == want


def test_substring_window_pairs_semantics(spark):
    # a/b share an 8-token run; c shares only 7 tokens with a; d..z all
    # contain the same boilerplate window, which the cap must drop.
    shared = "one two three four five six seven eight"
    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    rows = [
        (0, shared + " tail-a"),
        (1, "head-b " + shared),
        (2, "one two three four five six seven DIFFERENT"),
    ] + [(10 + i, boiler + f" doc{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_a, r.doc_b)
        for r in substring_window_pairs(
            df, "doc_id", "text", window=8, max_docs_per_window=3
        ).collect()
    }
    # boilerplate window appears in 5 > 3 docs → contributes no pairs
    assert pairs == {(0, 1)}
    # with the cap lifted the boilerplate family pairs up fully
    pairs_nocap = {
        (r.doc_a, r.doc_b)
        for r in substring_window_pairs(
            df, "doc_id", "text", window=8, max_docs_per_window=100
        ).collect()
    }
    boiler_ids = [10, 11, 12, 13, 14]
    want = {(0, 1)} | {
        (a, b) for a in boiler_ids for b in boiler_ids if a < b
    }
    assert pairs_nocap == want


def test_substring_window_short_docs_no_negative_sequence(spark):
    # fewer tokens than the window must yield zero rows, not a
    # descending sequence(0, negative) explosion
    df = spark.createDataFrame(
        [(0, "just three tokens"), (1, "just three tokens")],
        "doc_id long, text string",
    )
    assert substring_window_pairs(df, "doc_id", "text", window=8).count() == 0


def test_redact_pii_boundaries(spark):
    df = spark.createDataFrame(
        [
            (0, "mail a.b_c%d+e@ex-ample.co.uk end"),
            (1, "call 555-1234"),  # phone at end-of-string boundary
            (2, "5555-1234 not a phone, 555-123 too short"),
            (3, "two bob@x.io ted@y.ai emails"),
            (4, "mail John.Doe@Gmail.COM mixed case"),
        ],
        "id long, t string",
    )
    got = {r.id: r.red for r in df.select("id", redact_pii(F.col("t")).alias("red")).collect()}
    assert got[0] == "mail <EMAIL> end"
    assert got[1] == "call <PHONE>"
    assert got[2] == "5555-1234 not a phone, 555-123 too short"
    assert got[3] == "two <EMAIL> <EMAIL> emails"
    # uppercase local part / domain must redact too (code-review finding,
    # round 4: the lowercase-only class let Gmail.com addresses leak)
    assert got[4] == "mail <EMAIL> mixed case"
