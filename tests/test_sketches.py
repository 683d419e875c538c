"""Deterministic HLL sketch: cross-engine equality is covered by the
driver oracle (events_hll); here we pin accuracy vs exact counts and the
pure-function determinism of the estimate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from knowledge_nexus_spark.operators.sketches import (
    BLOOM_BITS,
    BLOOM_HASHES,
    M_REGISTERS,
    bloom_build,
    bloom_might_contain,
    cms_build,
    cms_estimate,
    hll_distinct,
)


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


def test_cms_overestimates_and_bounds(spark):
    """CM estimates are exact-or-over, never under; with 50 keys in a
    4×256 sketch collisions are rare so most estimates are exact."""
    rows = [(f"k{i}", ) for i in range(50) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "v string")
    exact = {f"k{i}": i + 1 for i in range(50)}
    est = {
        r["v"]: r["cms_est"]
        for r in cms_estimate(cms_build(df, "v"), df, "v").collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    n_exact = sum(est[k] == exact[k] for k in exact)
    assert n_exact >= 45  # depth-4 min over 256 buckets: collisions rare


def test_cms_partition_invariant(spark):
    rows = [(f"k{i % 30}",) for i in range(3000)]
    df = spark.createDataFrame(rows, "v string")
    a = sorted(
        map(tuple, cms_estimate(cms_build(df.repartition(1), "v"), df, "v").collect())
    )
    b = sorted(
        map(
            tuple,
            cms_estimate(cms_build(df.repartition(16, "v"), "v"), df, "v").collect(),
        )
    )
    assert a == b


def test_bloom_no_false_negatives_and_fp_rate(spark):
    members = spark.createDataFrame([(f"m{i}",) for i in range(500)], "v string")
    outsiders = spark.createDataFrame([(f"x{i}",) for i in range(2000)], "v string")
    bloom = bloom_build(members, "v")
    got_m = {
        r["v"]: r["might_contain"]
        for r in bloom_might_contain(bloom, members, "v").collect()
    }
    assert all(got_m.values())  # every member must test positive
    got_x = [
        r["might_contain"]
        for r in bloom_might_contain(bloom, outsiders, "v").collect()
    ]
    # partitioned bloom fp rate = (1-(1-1/m)^n)^k ≈ (n/m)^k at n<<m
    fp_theory = (1 - (1 - 1 / BLOOM_BITS) ** 500) ** BLOOM_HASHES
    fp_seen = sum(got_x) / len(got_x)
    assert fp_seen <= max(5 * fp_theory, 0.02), (fp_seen, fp_theory)


def test_hll_partition_invariant(spark, keyed):
    """Repartitioning (different aggregation order) gives the identical
    estimate — the register sum is exact-integer, not float."""
    df, _ = keyed
    a = sorted(map(tuple, hll_distinct(df.repartition(1), "g", "v").collect()))
    b = sorted(map(tuple, hll_distinct(df.repartition(16, "v"), "g", "v").collect()))
    assert a == b


def test_hll_merge_equals_direct(spark, keyed):
    """Registers are a max-semilattice: sketching arbitrary partitions
    (here: 7 hash shards) and merging max-per-bucket must give registers
    — and therefore estimates — BIT-EQUAL to the single-pass sketch."""
    from knowledge_nexus_spark.operators.sketches import (
        hll_estimate,
        hll_merge_registers,
        hll_registers,
    )

    df, _ = keyed
    sharded = df.withColumn("shard", F.pmod(F.xxhash64("v"), F.lit(7)))
    merged_regs = hll_merge_registers(
        hll_registers(sharded, ["g", "shard"], "v"), ["g"]
    )
    direct_regs = hll_registers(df, ["g"], "v")
    assert sorted(map(tuple, merged_regs.collect())) == sorted(
        map(tuple, direct_regs.collect())
    )
    a = sorted(map(tuple, hll_estimate(merged_regs, "g").collect()))
    b = sorted(map(tuple, hll_distinct(df, "g", "v").collect()))
    assert a == b
