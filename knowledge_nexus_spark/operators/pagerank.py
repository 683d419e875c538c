"""Fixed-point PageRank — the iterative-algorithm representative of the
graph suite (generalizes the reference's static relevance ordering; the
reference has no iterative graph computation at all, its graph lives in
Neo4j and is queried 1-2 hops at a time, /root/reference/graph_rag/
storage/neo4j_manager.py:85-133).

Why FIXED-POINT (integer) arithmetic: float PageRank is summation-order
dependent, so no external oracle can reproduce it bit-for-bit. Here rank
mass is carried as scaled BIGINT micro-units and every operation is
integer (floored division on out-degree fan-out, integer damping
``(num·sum) DIV den``), making the result after K iterations a pure
function of the graph — equal in Spark, DuckDB, or anything else. The
truncation error vs real PageRank is ≤ outdeg·K ulps of 1e-6 — noise.

Semantics (documented, mirrored in the oracle):
- every node starts at ``scale`` (1.0);
- each iteration a node sends ``rank DIV outdeg`` to each out-neighbor
  (the DIV remainder is dropped, NOT redistributed);
- dangling nodes (outdeg 0) send nothing (their mass decays — the
  classical "no dangling redistribution" variant);
- new rank = ``(scale·(den−num)) DIV den + (num·received) DIV den``.

Scale shape: each iteration is contribution fan-out (narrow (src,rank)
join against the edge list, shuffle on src) + one aggregation shuffled on
dst — the standard Pregel-on-DataFrames plan. ``localCheckpoint`` every
few iterations cuts the growing lineage; hot (hub) destinations are plain
aggregation keys, which AQE skew-splits since partial aggregation
applies. No Python, no floats, no driver-side state but the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank_fixed_point(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Returns (id, rank BIGINT) after ``iterations`` synchronous steps.

    ``nodes``: one row per vertex. ``edges``: directed (src, dst) pairs
    (parallel edges count multiply — matches the oracle).
    """
    n = nodes.select(F.col(id_col).alias("id")).distinct()
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # (src, dst, outdeg) is loop-invariant: compute once, keep narrow.
    fan = e.join(outdeg, "src").localCheckpoint(eager=False)

    base = (SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    ranks = n.withColumn("rank", F.lit(SCALE).cast("long"))

    for i in range(iterations):
        contrib = (
            fan.join(ranks.withColumnRenamed("id", "src"), "src")
            .select("dst", F.expr("rank DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("received"))
        )
        ranks = (
            n.join(contrib.withColumnRenamed("dst", "id"), "id", "left_outer")
            .select(
                "id",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"(CAST({DAMP_NUM} AS BIGINT) * coalesce(received, CAST(0 AS BIGINT))) DIV {DAMP_DEN}"
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
