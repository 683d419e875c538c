"""Similarity search over embedding columns (W2 generalized, driver-mandated
ANN extension).

  cosine_topk     — brute-force exact top-k: native cosine + TakeOrdered
                    (per-partition heap, no global sort) — the baseline
  lsh_topk        — random-hyperplane bucketed ANN: probe the query's
                    bucket across several independent bands, exact re-rank
                    inside the union of probed buckets — the scale path
                    (at 100 TB only the probed buckets are scanned when the
                    table is written bucketed/partitioned by signature)
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
    """Approximate k-NN per row: banded candidate join + per-id window top-k."""
    from knowledge_nexus_spark.operators.dedup import _banded

    banded = _banded(df, id_col, vec_col, dim, bands, band_planes, seed)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("a.id") != F.col("b.id"))
        .select(
            F.col("a.id").alias("id"),
            F.col("b.id").alias("neighbor"),
            F.col("a.vec").alias("va"),
            F.col("b.vec").alias("vb"),
        )
        .dropDuplicates(["id", "neighbor"])
        .withColumn("score", cosine_col(F.col("va"), F.col("vb")))
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("neighbor"))
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("id", "neighbor", "score")
    )
