"""k-core peeling and ordered-fold EWMA semantics on hand-computable
graphs/sequences (the driver gate only sees the generated tables)."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_nexus_spark.operators.components import kcore_peel


def test_kcore_peels_pendant_chain(spark):
    # triangle 1-2-3 (each degree 2) + pendant chain 3-4, 4-5
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    got = {
        (r.node, r.deg)
        for r in kcore_peel(edges, k=2, iterations=3).collect()
    }
    # round 1: node 5 (deg 1) drops → edge 4-5 gone; round 2: node 4
    # (deg 1) drops → edge 3-4 gone; triangle survives at deg 2
    assert got == {(1, 2), (2, 2), (3, 2)}


def test_kcore_symmetrizes_and_drops_self_loops(spark):
    # directed duplicates + a self-loop must not inflate degree
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 1), (2, 3), (1, 3)], "src long, dst long"
    )
    got = {
        (r.node, r.deg)
        for r in kcore_peel(edges, k=2, iterations=1).collect()
    }
    assert got == {(1, 2), (2, 2), (3, 2)}


def test_kcore_bounded_rounds_vs_full_peel(spark):
    # a 4-chain at k=2 needs 2 rounds to empty; 1 round leaves the middle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    one = kcore_peel(edges, k=2, iterations=1).count()
    two = kcore_peel(edges, k=2, iterations=2).count()
    assert (one, two) == (2, 0)


def test_ewma_fold_is_ordered_and_integer(spark):
    from knowledge_nexus_spark.plans.driver_queries import q_events_ewma
    import datetime

    # user 1: values 8, 4, 2 (micro-units 8e6, 4e6, 2e6) in ts order
    # fold: 0 → (0+8e6)//2 = 4e6 → (4e6+4e6)//2 = 4e6 → (4e6+2e6)//2 = 3e6
    rows = [
        (3, datetime.datetime(2024, 1, 1, 0, 0, 2), 1, "view", 2.0, "{}"),
        (1, datetime.datetime(2024, 1, 1, 0, 0, 0), 1, "view", 8.0, "{}"),
        (2, datetime.datetime(2024, 1, 1, 0, 0, 1), 1, "view", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    import tempfile, os

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = q_events_ewma(spark, d).collect()
    assert [(r.user_id, r.ewma_micros, r.n) for r in out] == [(1, 3_000_000, 3)]
