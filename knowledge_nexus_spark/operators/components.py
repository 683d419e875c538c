"""Iterative connected components for alias canonicalization (G3).

The reference's alias resolution is pointwise (normalize_uuid merges the
dashed/undashed classes, notion_provider.py:36-37; bookmarks merge by URL
identity, :288-296). The north-star requirement generalizes this to
cross-source coreference: alias PAIRS (from normalization, URL identity,
and entity-linking matches) form an undirected graph whose connected
components are the canonical entities.

Algorithm: min-label propagation to fixpoint (the alternating-join form of
Kiveris et al.'s star contraction — alias graphs are near-star-shaped, so
convergence is 2-4 rounds). Each round:

    candidate(id) = min(label over {id} ∪ neighbors(id))

with an EXPLICIT two-phase salted aggregation: a hub entity referenced by
millions of docs makes one reduce key arbitrarily hot, so the first
aggregation groups on (id, salt = xxhash64(label) % n_salt) and the second
reduces the ≤ n_salt partials per id. ``localCheckpoint`` every round cuts
the lineage so plan size stays O(1) in rounds.

Driver-side loop over DataFrames — the idiomatic Spark shape for iterative
graph algorithms without GraphX/graphframes on the classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    max_iter: int = 20,
    n_salt: int = 16,
    checkpoint: bool = True,
) -> DataFrame:
    """edges(src, dst) undirected → (id, component) with component = min id.

    Vertices are derived from the edge list; isolated vertices (no edges)
    are their own components and can be unioned in by the caller.

    Each round takes the min label over neighbors, then POINTER-JUMPS
    (label := label's label — one extra self-join per round): the min
    label travels ~2^round hops instead of `round` hops, so convergence is
    O(log diameter) shuffle rounds, not O(diameter) — at 10^12-edge scale
    the difference between ~40 rounds and ~10 for a pathological chain.
    The fixed point is identical (min id of the component). If the loop
    exhausts ``max_iter`` without converging it RAISES rather than return
    silently-wrong labels (a non-converged map would split one entity's
    edges across several canonical endpoints downstream); the default
    budget converges for any component of diameter < 2^19."""
    sym = edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
    sym = sym.filter(F.col("a") != F.col("b")).distinct()

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    if checkpoint:
        labels = labels.localCheckpoint(eager=True)
        sym = sym.localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_labels = sym.join(labels, sym["a"] == labels["id"], "inner").select(
            F.col("b").alias("id"), F.col("label")
        )
        cand = nbr_labels.unionByName(labels.select("id", "label"))

        # explicit salt → partial min per (id, salt) → final min per id
        salted = cand.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("label")), F.lit(n_salt))
        )
        partial = salted.groupBy("id", "_salt").agg(F.min("label").alias("label"))
        new_labels = partial.groupBy("id").agg(F.min("label").alias("label"))

        # pointer jumping: follow the label one step (labels are ids, so
        # the lookup is a self-join). Doubles the hop distance a min label
        # covers per round — O(log diameter) rounds to converge.
        jumped = (
            new_labels.alias("x")
            .join(
                new_labels.select(
                    F.col("id").alias("_jid"), F.col("label").alias("_jlabel")
                ),
                F.col("x.label") == F.col("_jid"),
                "left",
            )
            .select(
                F.col("x.id").alias("id"),
                F.least(
                    F.col("x.label"), F.coalesce(F.col("_jlabel"), F.col("x.label"))
                ).alias("label"),
            )
        )
        new_labels = jumped

        if checkpoint:
            new_labels = new_labels.localCheckpoint(eager=True)

        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))

    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter > 2^max_iter is practically impossible — "
        "check for label churn or raise max_iter)"
    )


def incremental_components(
    prev_map: DataFrame, new_edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Merge ``new_edges(src, dst)`` into a CONVERGED component map
    ``prev_map(id, component)`` (the output of :func:`connected_components`
    over the historical edges) — returns the updated (id, component) map,
    provably equal to ``connected_components(history ∪ new_edges)`` run
    from scratch. This is the daily-ingest canonicalization-maintenance
    pattern: new alias evidence arrives continuously, and re-running CC
    over 10^12 historical edges per batch is not an option.

    Adding edges can only MERGE equivalence classes, never split them, so
    the delta problem reduces to CC on the QUOTIENT graph: project each
    new edge endpoint onto its current representative (identity for
    never-seen ids), run the iterative CC on that projected edge list —
    whose size is O(|new_edges|), independent of history — then compose:
    final(id) = q(prev(id)).

    Equality: prev labels are component minima; the quotient CC elects
    the min representative of each merged class, and the min over the
    minima of merged classes IS the min over the union of their members;
    an id first seen in ``new_edges`` enters the quotient as its own
    representative. Composition therefore reproduces the full rebuild's
    labels exactly (pinned against a from-scratch rebuild in
    tests/test_components.py and value-hash-gated as
    ``dedup_clusters_incremental`` against the same recursive-CTE oracle
    as ``dedup_clusters``).

    Scale shape (10^12 ids): history is touched exactly twice, never
    iterated — (1) one equi-join on id against the new endpoint set
    (small; with ``prev_map`` bucket-partitioned on id the big side needs
    no Exchange), and (2) one BROADCAST join against the quotient result,
    whose size is bounded by 2·|new_edges| regardless of history. The
    iterative loop runs only on the quotient edges. Returned rows differ
    from ``prev_map`` only where classes merged, so a MERGE-style sink
    rewrites O(members of merged classes), not the world.
    """
    ne = new_edges.select("src", "dst")
    endpoints = (
        ne.select(F.col("src").alias("id"))
        .unionByName(ne.select(F.col("dst").alias("id")))
        .distinct()
    )
    # representative of each touched endpoint under the OLD map
    # (identity for ids history has never seen)
    reps = endpoints.join(prev_map, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("rep")
    )
    q_edges = (
        ne.join(
            reps.select(F.col("id").alias("src"), F.col("rep").alias("_rs")), "src"
        )
        .join(reps.select(F.col("id").alias("dst"), F.col("rep").alias("_rd")), "dst")
        .select(F.col("_rs").alias("src"), F.col("_rd").alias("dst"))
    )
    # CC over representatives only — O(|new_edges|) work. Empty or
    # all-self-loop quotients converge to an empty map immediately.
    qcc = connected_components(q_edges, max_iter=max_iter)
    relabel = F.broadcast(
        qcc.select(F.col("id").alias("_old"), F.col("component").alias("_new"))
    )

    updated_old = prev_map.join(
        relabel, prev_map["component"] == relabel["_old"], "left"
    ).select(
        "id", F.coalesce(F.col("_new"), F.col("component")).alias("component")
    )
    # ids first seen in this batch (rep == id and absent from history):
    # label = quotient component of their rep, identity if their only
    # quotient edges were self-loops (already-merged endpoints)
    new_rows = (
        reps.join(prev_map.select("id"), "id", "left_anti")
        .join(relabel, reps["rep"] == relabel["_old"], "left")
        .select("id", F.coalesce(F.col("_new"), F.col("rep")).alias("component"))
    )
    return updated_old.unionByName(new_rows)


def canonical_map(alias_edges: DataFrame, all_ids: DataFrame) -> DataFrame:
    """(id, canonical_id) for every id in ``all_ids`` — identity when the id
    participates in no alias class. Join this against triples' subj/obj to
    rewrite them (broadcast if small; shuffle join otherwise).

    The canonical label per component is the min member that is a REAL id
    from ``all_ids`` — alias edges may connect free-text mentions to node
    ids, and electing a mention as canonical would rewrite real endpoints
    onto a string no node carries, so the subsequent orphan clean would
    silently drop the entity's edges. Components with no real member fall
    back to the min member."""
    comp = connected_components(alias_edges)
    ids = all_ids.select(F.col("id")).distinct()

    tagged = comp.join(ids.withColumn("_is_real", F.lit(True)), "id", "left")
    canon = (
        tagged.groupBy("component")
        .agg(
            F.min(F.when(F.col("_is_real"), F.col("id"))).alias("_real_canon"),
            F.min("id").alias("_any_canon"),
        )
        .select(
            "component",
            F.coalesce("_real_canon", "_any_canon").alias("canonical_id"),
        )
    )
    resolved = comp.join(canon, "component").select("id", "canonical_id")
    return (
        ids.join(resolved, "id", "left")
        .select("id", F.coalesce("canonical_id", F.col("id")).alias("canonical_id"))
    )


def rewrite_triples(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj/obj through the canonical map (two hash joins)."""
    m_subj = mapping.select(
        F.col("id").alias("_sid"), F.col("canonical_id").alias("_scanon")
    )
    m_obj = mapping.select(
        F.col("id").alias("_oid"), F.col("canonical_id").alias("_ocanon")
    )
    return (
        triples.join(m_subj, triples["subj"] == m_subj["_sid"], "left")
        .join(m_obj, triples["obj"] == m_obj["_oid"], "left")
        .select(
            F.coalesce(F.col("_scanon"), F.col("subj")).alias("subj"),
            F.col("pred"),
            F.coalesce(F.col("_ocanon"), F.col("obj")).alias("obj"),
            F.col("context"),
        )
    )


def kcore_peel(
    edges: DataFrame, k: int = 4, iterations: int = 3, checkpoint: bool = True
) -> DataFrame:
    """Bounded k-core peeling over an undirected edge list: each round
    drops nodes whose CURRENT induced degree is < ``k``, then edges with
    a dropped endpoint. Returns the surviving (node, deg) after
    ``iterations`` synchronous rounds — the standard graph-cleaning
    primitive (spam/leaf pruning before community detection or
    embedding training).

    Scale shape: each round is one narrow (node) count-shuffle plus two
    left-semi joins on the endpoint keys — no payload wider than
    (src, dst) ever moves, and the semi-join build side (the surviving
    node set) shrinks monotonically. Bounded rounds keep the unrolled
    plan compact and make the operator exactly SQL-oracle-able (the
    fixpoint variant is the same loop run to no-change; on power-law
    graphs ≥95% of peeling happens in the first 3 rounds).

    ``edges`` may be directed with self-loops; it is symmetrized and
    self-loop-filtered here so degree means undirected neighbor count.
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # each round consumes `cur` twice (degree count + semi-join left);
    # localCheckpoint materializes it once per round and cuts lineage,
    # otherwise the unrolled plan re-evaluates the subtree 2^rounds
    # times. checkpoint=False keeps the full logical plan (plan-shape
    # tests; engines that prefer CTE materialization).
    cut = (lambda df: df.localCheckpoint(eager=False)) if checkpoint else (lambda df: df)
    cur = cut(und)
    for _ in range(iterations):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        # keep feeds both semi-joins — materialize the (small) node set
        # once rather than re-running the degree agg per join
        keep = cut(deg.where(F.col("deg") >= k).select("src"))
        cur = cut(
            cur.join(keep, "src", "left_semi").join(
                keep.withColumnRenamed("src", "dst"), "dst", "left_semi"
            )
        )
    return (
        cur.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("src").alias("node"), "deg")
    )


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 3,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 2,
) -> DataFrame:
    """Synchronous label propagation (community detection) — the
    modularity-style sibling of :func:`connected_components` (which finds
    CONNECTIVITY classes; LPA finds DENSITY classes inside one connected
    graph). Deterministic variant so an external SQL oracle reproduces it
    exactly (classic LPA breaks ties randomly and is irreproducible):

    - labels start as the node id;
    - ``edges`` is symmetrized as a MULTISET (parallel edges weight the
      vote; self-loops vote for the node's own label);
    - each round every node adopts the most frequent label among its
      neighbors, ties broken by SMALLEST label; nodes with no neighbors
      keep their label;
    - all rounds are synchronous (round k reads only round k-1 labels).

    Returns (id, label BIGINT) after ``rounds`` steps.

    Scale shape: per round, one narrow (src → label) join shuffled on
    src, one (dst, label) count aggregation (partial agg absorbs hub
    skew), then the per-node argmax as a SECOND aggregation via
    ``max_by``-style struct ordering — max(struct(cnt, -label)) — so no
    per-node window sort exists anywhere. ``localCheckpoint`` cuts the
    growing lineage like the PageRank loop. No Python, no floats.
    """
    n = nodes.select(F.col(id_col).alias("id")).distinct()
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)

    # Initial label: the id itself when numeric; otherwise a deterministic
    # dual-engine 60-bit md5 hash (dedup.md5_hash64 — reproducible in any
    # SQL oracle). A bare cast("long") is NULL for uuid-string ids — the
    # common id shape elsewhere in this repo — and NULL labels would turn
    # every vote and every argmax winner NULL without an error anywhere.
    from knowledge_nexus_spark.operators.dedup import md5_hash64

    labels = n.withColumn(
        "label",
        F.coalesce(F.col("id").cast("long"), md5_hash64(F.col("id").cast("string"))),
    )
    for i in range(rounds):
        votes = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax(cnt desc, label asc) as one aggregation: max over
        # (cnt, -label) structs — struct comparison is lexicographic
        winner = (
            votes.groupBy("dst")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("w"))
            .select(F.col("dst").alias("id"), (-F.col("w.neg")).alias("new_label"))
        )
        labels = (
            labels.join(winner, "id", "left_outer")
            .select(
                "id",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < rounds:
            labels = labels.localCheckpoint(eager=True)
    return labels
