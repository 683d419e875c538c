"""Similarity search over embedding columns (W2 generalized, driver-mandated
ANN extension).

  cosine_topk     — brute-force exact top-k: native cosine + TakeOrdered
                    (per-partition heap, no global sort) — the baseline
  lsh_topk        — random-hyperplane bucketed ANN over an in-memory /
                    ad-hoc frame: probe the query's bucket across several
                    independent bands, exact re-rank inside the union of
                    probed buckets. Signatures are computed at query time —
                    fine for one-off scans, wrong for a served index.
  write_lsh_index — materialize the signature index partitioned by
                    (band, key): the 100 TB layout where a query's probes
                    become PARTITION FILTERS and only the matching bucket
                    directories are scanned (pinned by a plan-shape test).
  lsh_topk_indexed— ANN against that stored index: partition-pruned
                    candidate read → re-join vectors from the base table →
                    exact re-rank. Per-query work is O(probed buckets + k),
                    independent of corpus size.
  knn_self_join   — k nearest neighbors for EVERY row via banded blocking
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from knowledge_nexus_spark.functions.embed import cosine_col


def _query_lit(query_vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    scored = df.select(
        F.col(id_col).alias("id"),
        cosine_col(F.col(vec_col), _query_lit(query_vec)).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col("id")).limit(k)


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    dim: int | None = None,
    bands: int = 8,
    band_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN: candidates = rows sharing ≥1 hyperplane-signature band with the
    query; exact cosine re-rank on candidates only. One Arrow pass computes
    all band signatures; the query's keys are literal filters, so when the
    table is stored bucketed by signature only the matching buckets scan."""
    from knowledge_nexus_spark.operators.dedup import _banded, query_band_keys

    dim = dim or len(query_vec)
    qkeys = query_band_keys(query_vec, dim, bands, band_planes, seed)

    banded = _banded(df, id_col, vec_col, dim, bands, band_planes, seed)
    match = F.lit(False)
    for i, key in enumerate(qkeys):
        match = match | ((F.col("band") == i) & (F.col("key") == key))
    cand = banded.filter(match).dropDuplicates(["id"])
    return (
        cand.withColumn("score", cosine_col(F.col("vec"), _query_lit(query_vec)))
        .select("id", "score")
        .orderBy(F.col("score").desc(), F.col("id"))
        .limit(k)
    )


def write_lsh_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    dim: int,
    bands: int = 8,
    band_planes: int = 8,
    seed: int = 42,
) -> None:
    """Materialize the hyperplane-signature index as a (band, key)-
    partitioned parquet table of (id) rows.

    This is the storage layout `lsh_topk`'s docstring promises: a query's
    band keys become partition filters, so only bands×1 bucket directories
    are ever read — at 10^12 rows the scan cost is the bucket size, not
    the corpus. Vectors are deliberately NOT duplicated into the index
    (that would store every embedding ``bands`` times); the query re-joins
    them from the base table AFTER candidate dedup, a k-sized lookup."""
    from knowledge_nexus_spark.operators.dedup import _banded

    banded = _banded(df, id_col, vec_col, dim, bands, band_planes, seed).select(
        "id", "band", "key"
    )
    banded.write.mode("overwrite").partitionBy("band", "key").parquet(path)


def lsh_topk_indexed(
    base: DataFrame,
    index_path: str,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    dim: int | None = None,
    bands: int = 8,
    band_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k against a stored ``write_lsh_index`` layout: the candidate
    read is partition-pruned to the query's (band, key) probes — no
    signature recomputation over the corpus at query time (the round-2
    `lsh_topk` gap). ``base`` supplies the vectors for the exact re-rank;
    the candidate set is tiny, so AQE broadcasts it into the base join."""
    from knowledge_nexus_spark.operators.dedup import query_band_keys

    spark = base.sparkSession
    dim = dim or len(query_vec)
    qkeys = query_band_keys(query_vec, dim, bands, band_planes, seed)

    idx = spark.read.parquet(index_path)
    match = F.lit(False)
    for i, key in enumerate(qkeys):
        match = match | ((F.col("band") == i) & (F.col("key") == key))
    cand = idx.filter(match).select("id").dropDuplicates(["id"])

    vecs = base.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    return (
        cand.join(vecs, "id")
        .withColumn("score", cosine_col(F.col("vec"), _query_lit(query_vec)))
        .select("id", "score")
        .orderBy(F.col("score").desc(), F.col("id"))
        .limit(k)
    )


def knn_self_join(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    dim: int = 64,
    bands: int = 6,
    band_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate k-NN per row: banded candidate join + per-id window top-k.

    Shuffle-width note (mirrors ``dedup.embedding_neardup_pairs``): the
    banded explode and the (band, key) self-join carry ONLY (id, band, key)
    — the bands×rows explosion and bucket shuffle move ~16 bytes/row, not
    two embedding arrays per candidate. Vectors re-join once per side
    AFTER the (id, neighbor) dedup, so each embedding crosses the wire
    once per side of a surviving pair instead of ``bands`` times per row.
    Pinned by test_plan_shapes (no array column below the band Exchange)."""
    from knowledge_nexus_spark.operators.dedup import _banded

    keyed = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    banded = _banded(keyed, "id", "vec", dim, bands, band_planes, seed).select(
        "id", "band", "key"
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.id") != F.col("b.id"))
        .select(F.col("a.id").alias("id"), F.col("b.id").alias("neighbor"))
        .dropDuplicates(["id", "neighbor"])
    )
    va = keyed.select(F.col("id").alias("id"), F.col("vec").alias("va"))
    vb = keyed.select(F.col("id").alias("neighbor"), F.col("vec").alias("vb"))
    scored = (
        cand.join(va, "id")
        .join(vb, "neighbor")
        .withColumn("score", cosine_col(F.col("va"), F.col("vb")))
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("neighbor"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("id", "neighbor", "score")
    )
