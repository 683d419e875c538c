"""Connected components vs a pure-Python union-find, incl. skew + property
tests (SURVEY.md §5 rebuild strategy item 4)."""

import random

from pyspark.sql import functions as F

from knowledge_nexus_spark.operators.components import (
    canonical_map,
    connected_components,
    incremental_components,
    rewrite_triples,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # canonical = min element of each component
    comp = {}
    for x in list(parent):
        comp.setdefault(find(x), []).append(x)
    out = {}
    for root, members in comp.items():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _check(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.id: r.component for r in connected_components(df).collect()}
    want = _union_find(edges)
    assert got == want


def test_simple_chain(spark):
    _check(spark, [("a", "b"), ("b", "c"), ("d", "e")])


def test_star_and_cycle(spark):
    edges = [("hub", f"n{i}") for i in range(30)] + [("x", "y"), ("y", "z"), ("z", "x")]
    _check(spark, edges)


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (f"v{rng.randrange(n)}", f"v{rng.randrange(n)}")
            for _ in range(rng.randint(20, 80))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        _check(spark, edges)


def test_hot_key_skew_converges(spark):
    """One hub at 100× median degree (the reference's root-page shape)."""
    edges = [("hub", f"leaf{i}") for i in range(400)]
    edges += [(f"leaf{i}", f"leaf2_{i}") for i in range(0, 400, 50)]
    _check(spark, edges)


def test_canonical_label_is_real_id(spark):
    """An alias class may contain free-text mentions that sort before every
    node id; the canonical label must still be a REAL id, else rewriting
    maps node endpoints onto strings no node carries and the orphan clean
    silently drops the entity's edges."""
    alias = spark.createDataFrame(
        [("aaa mention", "doc9"), ("aaa mention", "doc5")], ["src", "dst"]
    )
    ids = spark.createDataFrame([("doc5",), ("doc9",), ("zzz",)], ["id"])
    got = {r.id: r.canonical_id for r in canonical_map(alias, ids).collect()}
    assert got == {"doc5": "doc5", "doc9": "doc5", "zzz": "zzz"}


def test_canonical_map_and_rewrite(spark):
    alias = spark.createDataFrame([("b", "a"), ("c", "b")], ["src", "dst"])
    ids = spark.createDataFrame([("a",), ("b",), ("c",), ("solo",)], ["id"])
    mapping = canonical_map(alias, ids)
    got = {r.id: r.canonical_id for r in mapping.collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "solo": "solo"}

    triples = spark.createDataFrame(
        [("c", "REFERENCES", "solo", None), ("solo", "CONTAINS", "b", "ctx")],
        ["subj", "pred", "obj", "context"],
    )
    rewritten = {(r.subj, r.pred, r.obj) for r in rewrite_triples(triples, mapping).collect()}
    assert rewritten == {("a", "REFERENCES", "solo"), ("solo", "CONTAINS", "a")}


def _inc_check(spark, old_edges, new_edges):
    """incremental_components(cc(old), new) must equal cc(old ∪ new) on
    every id either side has seen."""
    prev = connected_components(spark.createDataFrame(old_edges, ["src", "dst"]))
    got = {
        r.id: r.component
        for r in incremental_components(
            prev, spark.createDataFrame(new_edges, ["src", "dst"])
        ).collect()
    }
    want = _union_find(old_edges + new_edges)
    assert got == want


def test_incremental_merges_two_old_components(spark):
    """One new edge bridging two historical chains relabels BOTH chains to
    the global min; untouched components keep their labels."""
    _inc_check(
        spark,
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q")],
        [("c", "x")],
    )


def test_incremental_new_ids_only(spark):
    """A batch whose ids history has never seen forms fresh components."""
    _inc_check(spark, [("a", "b")], [("n1", "n2"), ("n2", "n3")])


def test_incremental_mixed_chain_through_new_id(spark):
    """A new id bridges two old components transitively (old–new–old), and
    a redundant within-component edge (self-loop in the quotient) is a
    no-op."""
    _inc_check(
        spark,
        [("a", "b"), ("x", "y")],
        [("b", "fresh"), ("fresh", "y"), ("a", "b")],
    )


def test_incremental_matches_full_on_random_graphs(spark):
    rng = random.Random(13)
    for _ in range(3):
        n = 50
        edges = [
            (f"v{rng.randrange(n)}", f"v{rng.randrange(n)}")
            for _ in range(rng.randint(30, 90))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if len(edges) < 4:
            continue
        cut = rng.randint(1, len(edges) - 1)
        _inc_check(spark, edges[:cut], edges[cut:])


def test_long_chain_converges_in_log_rounds(spark):
    """Pointer jumping makes convergence O(log diameter): a 600-link chain
    (diameter 600) must converge within 12 rounds — plain min-label
    propagation moves the min one hop per round and would need ~600.
    Labels still equal the component minimum."""
    n = 600
    edges = [(f"c{i:04d}", f"c{i + 1:04d}") for i in range(n)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.id: r.component for r in connected_components(df, max_iter=12).collect()}
    assert got == {f"c{i:04d}": "c0000" for i in range(n + 1)}


def test_incremental_quotient_relabel_is_broadcast(spark):
    """The composition join against history must broadcast the quotient
    result — history itself is never shuffled by the relabel step."""
    prev = connected_components(
        spark.createDataFrame([("a", "b"), ("x", "y")], ["src", "dst"])
    )
    out = incremental_components(
        prev, spark.createDataFrame([("b", "x")], ["src", "dst"])
    )
    plan = out._jdf.queryExecution().sparkPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_docs_canonical_invariants(spark):
    """docs_canonical (cluster -> keep best member): the kept doc is a real
    member of its cluster with the cluster-max token count (ties -> greatest
    doc_id), clusters partition the corpus, singletons keep themselves."""
    from knowledge_nexus_spark.plans.driver_queries import (
        q_dedup_clusters,
        q_docs_canonical,
    )

    sf = "/root/testdata/sf0.001"
    mapping = {r.doc_id: r.canonical_id for r in q_dedup_clusters(spark, sf).collect()}
    kept = q_docs_canonical(spark, sf).collect()

    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    n_tok = {
        r.doc_id: (0 if not r.text.strip() else len(r.text.strip().lower().split()))
        for r in docs.collect()
    }

    assert sum(r.n_members for r in kept) == len(mapping)
    assert len(kept) == len(set(mapping.values()))
    for r in kept:
        members = [d for d, c in mapping.items() if c == r.canonical_id]
        assert mapping[r.keep_id] == r.canonical_id
        assert r.n_members == len(members)
        best = max(n_tok[d] for d in members)
        assert r.kept_tokens == best
        # tie-break: greatest doc_id among the max-token members
        assert r.keep_id == max(d for d in members if n_tok[d] == best)
