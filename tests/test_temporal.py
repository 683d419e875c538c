"""As-of join + range join (operators/temporal) vs brute-force references.

The reference repo has no temporal joins (its only temporal operator is the
freshness comparison, notion_provider.py:55-59); these are the
training-data-pipeline extensions the driver mandates. Correctness here is
pinned against pandas merge_asof and an explicit cross-join filter.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest

from pyspark.sql import functions as F

from knowledge_nexus_spark.operators.temporal import asof_join, range_join

BASE = dt.datetime(2024, 1, 1)


def _mk_events(seed, n, n_users, kinds):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                BASE + dt.timedelta(seconds=rng.uniform(0, 86400)),
                rng.randrange(n_users),
                rng.choice(kinds),
                round(rng.uniform(0, 100), 2),
            )
        )
    return rows


@pytest.fixture(scope="module")
def events(spark):
    rows = _mk_events(7, 400, 12, ["a", "b"])
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).cache()


def test_asof_matches_pandas_merge_asof(spark, events):
    left = events.filter(F.col("event_type") == "a").select("event_id", "user_id", "ts")
    right = events.filter(F.col("event_type") == "b").select("user_id", "ts", "event_id")

    got = (
        asof_join(left, right, on="user_id", right_cols=["ts", "event_id"])
        .select("event_id", "matched_event_id")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    exp = pd.merge_asof(
        lp,
        rp.rename(columns={"event_id": "matched_event_id", "ts": "r_ts"}),
        left_on="ts",
        right_on="r_ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )[["event_id", "matched_event_id"]].sort_values("event_id").reset_index(drop=True)

    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_asof_inclusive_vs_strict_tie(spark):
    t0 = BASE
    left = spark.createDataFrame([(1, 10, t0)], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(99, 10, t0)], "event_id long, user_id long, ts timestamp")

    inc = asof_join(left, right, on="user_id", right_cols=["ts", "event_id"]).collect()
    assert inc[0]["matched_event_id"] == 99

    strict = asof_join(
        left, right, on="user_id", right_cols=["ts", "event_id"], strict=True
    ).collect()
    assert strict[0]["matched_event_id"] is None


def test_asof_no_match_is_null(spark):
    left = spark.createDataFrame(
        [(1, 10, BASE)], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(99, 10, BASE + dt.timedelta(seconds=5))],
        "event_id long, user_id long, ts timestamp",
    )
    out = asof_join(left, right, on="user_id", right_cols=["ts", "event_id"]).collect()
    assert out[0]["matched_event_id"] is None


def test_asof_tie_break_deterministic(spark):
    """Two right rows at the same admissible ts: the largest payload tuple
    (ts, event_id) wins — the documented deterministic choice."""
    t0 = BASE
    left = spark.createDataFrame(
        [(1, 10, t0 + dt.timedelta(seconds=1))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, 10, t0), (7, 10, t0)], "event_id long, user_id long, ts timestamp"
    )
    out = asof_join(left, right, on="user_id", right_cols=["ts", "event_id"]).collect()
    assert out[0]["matched_event_id"] == 7


def test_range_join_matches_bruteforce(spark, events):
    left = events.filter(F.col("event_type") == "a").select("event_id", "user_id", "ts")
    right = events.filter(F.col("event_type") == "b").select(
        "user_id", "ts", F.col("event_id").alias("rid")
    )

    got = (
        range_join(left, right, on="user_id", lower_seconds=-600.0, upper_seconds=300.0)
        .select("event_id", "r_rid")
        .toPandas()
        .sort_values(["event_id", "r_rid"])
        .reset_index(drop=True)
    )

    lp = left.toPandas()
    rp = right.toPandas()
    merged = lp.merge(rp, on="user_id", suffixes=("", "_r"))
    delta = (merged["ts_r"] - merged["ts"]).dt.total_seconds()
    exp = (
        merged[(delta >= -600.0) & (delta <= 300.0)][["event_id", "rid"]]
        .rename(columns={"rid": "r_rid"})
        .sort_values(["event_id", "r_rid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_range_join_exact_boundaries(spark):
    """Rows exactly on both range boundaries are included (closed interval,
    integer-microsecond comparison — no float wobble)."""
    t0 = BASE
    left = spark.createDataFrame([(1, 10, t0)], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [
            (20, 10, t0 - dt.timedelta(seconds=600)),   # exactly lower
            (21, 10, t0 + dt.timedelta(seconds=300)),   # exactly upper
            (22, 10, t0 - dt.timedelta(seconds=600, microseconds=1)),  # just out
            (23, 10, t0 + dt.timedelta(seconds=300, microseconds=1)),  # just out
        ],
        "event_id long, user_id long, ts timestamp",
    )
    got = sorted(
        r["r_event_id"]
        for r in range_join(
            left, right, on="user_id", lower_seconds=-600.0, upper_seconds=300.0
        ).collect()
    )
    assert got == [20, 21]


def test_range_join_plan_is_equijoin(spark, events):
    """The physical join must be an equi-join (SortMerge/ShuffledHash), not
    BroadcastNestedLoop/Cartesian — that is the whole point of bucketing."""
    left = events.select("event_id", "user_id", "ts")
    right = events.select("user_id", "ts", F.col("event_id").alias("rid"))
    plan = range_join(
        left, right, on="user_id", lower_seconds=-60.0, upper_seconds=60.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_tolerance(spark):
    t0 = BASE
    left = spark.createDataFrame(
        [(1, 10, t0 + dt.timedelta(seconds=100)), (2, 11, t0 + dt.timedelta(seconds=100))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(5, 10, t0), (6, 11, t0 + dt.timedelta(seconds=40))],
        "event_id long, user_id long, ts timestamp",
    )
    out = {
        r["event_id"]: r["matched_event_id"]
        for r in asof_join(
            left, right, on="user_id", right_cols=["ts", "event_id"],
            tolerance_seconds=60.0,
        ).collect()
    }
    assert out[1] is None       # gap 100s > tolerance
    assert out[2] == 6          # gap 60s == tolerance (inclusive)


def test_asof_tolerance_matches_pandas(spark, events):
    left = events.filter(F.col("event_type") == "a").select("event_id", "user_id", "ts")
    right = events.filter(F.col("event_type") == "b").select("user_id", "ts", "event_id")

    got = (
        asof_join(left, right, on="user_id", right_cols=["ts", "event_id"],
                  tolerance_seconds=3600.0)
        .select("event_id", "matched_event_id")
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    exp = pd.merge_asof(
        lp, rp.rename(columns={"event_id": "matched_event_id", "ts": "r_ts"}),
        left_on="ts", right_on="r_ts", by="user_id", direction="backward",
        tolerance=pd.Timedelta(seconds=3600),
    )[["event_id", "matched_event_id"]].sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
