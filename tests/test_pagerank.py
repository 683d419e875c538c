"""Fixed-point PageRank: structural properties on known graphs (the
cross-engine exactness is pinned by the kg_pagerank driver oracle)."""

from __future__ import annotations

from knowledge_nexus_spark.operators.pagerank import SCALE, pagerank_fixed_point


def _ranks(spark, edges, n_nodes, iters=10):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["id"]: r["rank"]
        for r in pagerank_fixed_point(nodes, e, iterations=iters).collect()
    }


def test_hub_ranks_highest(spark):
    # star: everyone links to 0 (0 dangling) — reaches the exact fixed
    # point after 2 iterations: leaves at base, hub at base + 0.85·5·base
    edges = [(i, 0) for i in range(1, 6)]
    r = _ranks(spark, edges, 6)
    base = (SCALE * 15) // 100
    assert all(r[i] == base for i in range(1, 6))
    assert r[0] == base + (85 * 5 * base) // 100
    assert r[0] == max(r.values())


def test_cycle_is_uniform_and_conserves_mass(spark):
    # 4-cycle: perfectly symmetric, every node keeps rank == SCALE
    edges = [(i, (i + 1) % 4) for i in range(4)]
    r = _ranks(spark, edges, 4)
    assert set(r.values()) == {SCALE}


def test_dangling_mass_decays(spark):
    # 0 -> 1, 1 dangling: total mass must strictly decrease (documented
    # no-redistribution semantics), never increase
    r = _ranks(spark, [(0, 1)], 2, iters=3)
    assert sum(r.values()) < 2 * SCALE
    assert all(v >= (SCALE * 15) // 100 for v in r.values())


def test_deterministic_under_repartition(spark):
    edges = [(i, (i * 7 + 3) % 50) for i in range(50)] + [(i, (i * 11 + 1) % 50) for i in range(50)]
    nodes = spark.createDataFrame([(i,) for i in range(50)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, pagerank_fixed_point(nodes, e, iterations=6).collect()))
    b = sorted(
        map(
            tuple,
            pagerank_fixed_point(
                nodes.repartition(7), e.repartition(13, "dst"), iterations=6
            ).collect(),
        )
    )
    assert a == b
