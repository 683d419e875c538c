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
from knowledge_nexus_spark.operators.dedup import hyperplane_signature


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
    query; exact cosine re-rank on candidates only."""
    import numpy as np

    from knowledge_nexus_spark.operators.dedup import _hyperplanes

    dim = dim or len(query_vec)
    q = np.asarray(query_vec, dtype=np.float64)

    def sig_of_query(band_seed: int) -> int:
        planes = np.asarray(_hyperplanes(dim, band_planes, band_seed))
        bits = (planes @ q) > 0
        return int(sum(1 << i for i, b in enumerate(bits) if b))

    keyed = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    cand = None
    for i in range(bands):
        c = keyed.filter(
            hyperplane_signature(F.col("vec"), dim, band_planes, seed + i)
            == F.lit(sig_of_query(seed + i))
        )
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.dropDuplicates(["id"])
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
    keyed = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    banded = keyed.select(
        "id",
        "vec",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    hyperplane_signature(F.col("vec"), dim, band_planes, seed + i).alias("key"),
                )
                for i in range(bands)
            ])
        ).alias("bk"),
    ).select("id", "vec", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
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
