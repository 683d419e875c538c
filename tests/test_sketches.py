"""Deterministic HLL sketch: cross-engine equality is covered by the
driver oracle (events_hll); here we pin accuracy vs exact counts and the
pure-function determinism of the estimate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from knowledge_nexus_spark.operators.sketches import M_REGISTERS, hll_distinct


@pytest.fixture(scope="module")
def keyed(spark):
    # 3 groups with known cardinalities comfortably above 2.5*m (the raw
    # estimator's documented operating regime).
    n = {"a": 2000, "b": 5000, "c": 12000}
    rows = [(g, f"{g}-{i}") for g, cnt in n.items() for i in range(cnt)]
    return spark.createDataFrame(rows, "g string, v string"), n


def test_hll_within_3_sigma(spark, keyed):
    df, n = keyed
    assert min(n.values()) >= 2.5 * M_REGISTERS
    est = {r["g"]: r["hll_est"] for r in hll_distinct(df, "g", "v").collect()}
    sigma = 1.04 / (M_REGISTERS ** 0.5)
    for g, exact in n.items():
        rel = abs(est[g] - exact) / exact
        assert rel <= 3 * sigma, f"{g}: est={est[g]} exact={exact} rel={rel:.3f}"


def test_hll_is_set_function(spark, keyed):
    """Duplicates must not move the estimate (cardinality, not count)."""
    df, _ = keyed
    doubled = df.unionByName(df)
    a = sorted(map(tuple, hll_distinct(df, "g", "v").collect()))
    b = sorted(map(tuple, hll_distinct(doubled, "g", "v").collect()))
    assert a == b


def test_hll_partition_invariant(spark, keyed):
    """Repartitioning (different aggregation order) gives the identical
    estimate — the register sum is exact-integer, not float."""
    df, _ = keyed
    a = sorted(map(tuple, hll_distinct(df.repartition(1), "g", "v").collect()))
    b = sorted(map(tuple, hll_distinct(df.repartition(16, "v"), "g", "v").collect()))
    assert a == b
