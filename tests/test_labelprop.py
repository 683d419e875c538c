"""label_propagation: deterministic synchronous LPA vs an independent
pure-Python reference, plus community-structure sanity on a two-cluster
graph."""

from collections import Counter

import pytest

from knowledge_nexus_spark.operators.components import label_propagation

# two dense triangles bridged by one edge, plus an isolated node
EDGES = [
    (0, 1), (1, 2), (0, 2),          # triangle A
    (10, 11), (11, 12), (10, 12),    # triangle B
    (2, 10),                         # bridge
]
NODES = [0, 1, 2, 10, 11, 12, 99]    # 99 is isolated


def _reference(rounds):
    sym = EDGES + [(b, a) for a, b in EDGES]
    labels = {v: v for v in NODES}
    for _ in range(rounds):
        nxt = {}
        for v in NODES:
            votes = Counter(labels[s] for s, d in sym if d == v)
            if not votes:
                nxt[v] = labels[v]
                continue
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        labels = nxt
    return labels


@pytest.fixture(scope="module", params=[1, 2, 3, 4])
def rounds(request):
    return request.param


def test_matches_reference(spark, rounds):
    nodes = spark.createDataFrame([(v,) for v in NODES], ["id"])
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        r.id: r.label
        for r in label_propagation(nodes, edges, rounds=rounds).collect()
    }
    assert got == _reference(rounds), f"rounds={rounds}"


def test_communities_and_isolate(spark):
    nodes = spark.createDataFrame([(v,) for v in NODES], ["id"])
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        r.id: r.label
        for r in label_propagation(nodes, edges, rounds=3).collect()
    }
    # each triangle converges to its own min label; the isolate never moves
    assert got[0] == got[1] == got[2] == 0
    assert got[11] == got[12]
    assert got[99] == 99


def test_parallel_edges_weight_votes(spark):
    # node 5 has neighbors 1 (one edge) and 2 (two parallel edges):
    # with tie-to-smallest, label 1 would win 1v1 — the duplicate edge
    # must tip the vote to 2
    nodes = spark.createDataFrame([(1,), (2,), (5,)], ["id"])
    edges = spark.createDataFrame([(1, 5), (2, 5), (2, 5)], ["src", "dst"])
    got = {
        r.id: r.label
        for r in label_propagation(nodes, edges, rounds=1).collect()
    }
    assert got[5] == 2
