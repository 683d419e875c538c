"""Incremental aggregate-view maintenance: the merged view must equal a
full recompute for ANY batch split and ANY merge order (decomposable
partial states are associative + commutative)."""

import pytest

from pyspark.sql import functions as F

from knowledge_nexus_spark.storage.aggview import (
    agg_partial,
    finalize,
    merge_states,
)

SF = "/root/testdata/sf0.001"
KEYS = ["event_type"]


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_delta_merge_equals_full_rebuild(events):
    full = finalize(agg_partial(events, KEYS, "value"), KEYS)
    base = events.filter(F.col("event_id") % 4 != 3)
    delta = events.filter(F.col("event_id") % 4 == 3)
    view = merge_states(
        agg_partial(base, KEYS, "value"),
        agg_partial(delta, KEYS, "value"),
        KEYS,
    )
    assert _rows(finalize(view, KEYS)) == _rows(full)


def test_merge_order_and_split_invariant(events):
    """Three different split/merge schedules, one answer — the
    associativity that makes unlimited incremental rounds safe."""
    parts = [events.filter(F.col("event_id") % 3 == i) for i in range(3)]
    p = [agg_partial(x, KEYS, "value") for x in parts]
    a = merge_states(merge_states(p[0], p[1], KEYS), p[2], KEYS)
    b = merge_states(p[0], merge_states(p[2], p[1], KEYS), KEYS)
    c = merge_states(merge_states(p[2], p[0], KEYS), p[1], KEYS)
    ra, rb, rc = (_rows(finalize(x, KEYS)) for x in (a, b, c))
    assert ra == rb == rc


def test_delta_only_groups_appear_and_disjoint_pass_through(spark):
    view = agg_partial(
        spark.createDataFrame([("a", 1.0), ("a", 2.0)], "k string, value double"),
        ["k"],
        "value",
    )
    delta = agg_partial(
        spark.createDataFrame([("a", 4.0), ("b", 7.0)], "k string, value double"),
        ["k"],
        "value",
    )
    got = {r["k"]: r for r in finalize(merge_states(view, delta, ["k"]), ["k"]).collect()}
    assert got["a"]["n_rows"] == 3 and got["a"]["v_sum"] == 7.0
    assert got["b"]["n_rows"] == 1 and got["b"]["v_min"] == 7.0
