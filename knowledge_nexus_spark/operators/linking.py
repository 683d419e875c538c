"""Entity linking: MinHash-LSH blocking + embedding-cosine re-rank (J10).

The reference links mentions to entities degenerately — exact
normalized-uuid equality (notion_provider.py:169,36-37) and exact-URL
identity for bookmarks (:288-296); its README roadmap names string-match +
embedding-similarity coreference (README.md:271-272). This module is that
generalization, the one deliberately-beyond-reference operator the
north-star mandates.

Plan shape (all built-in Spark ML + native exprs):
  1. mentions(doc_id, mention) and entities(id, name)
  2. featurize: character 3-gram shingles → HashingTF sparse vectors
  3. MinHashLSH.approxSimilarityJoin with a Jaccard-distance threshold —
     the BLOCKING step: candidate pairs only, never the cross product
  4. re-rank candidates with deterministic hash-embedding cosine
  5. keep the best entity per mention (row_number window)

At 10^12-doc scale step 3 is the only shuffle that matters: LSH buckets
are the join key, so co-candidates co-locate; hot buckets (stopword-like
shingles) are bounded by the banding parameters (numHashTables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from knowledge_nexus_spark.functions.embed import cosine_col, embed_udf


def _char_shingles(col, n: int = 3):
    """Lower-cased character n-grams as an array column (native exprs)."""
    lowered = F.lower(col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(lowered) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: lowered.substr(i, F.lit(n))))


def link_entities(
    mentions: DataFrame,
    entities: DataFrame,
    jaccard_max_distance: float = 0.6,
    min_cosine: float = 0.3,
    num_hash_tables: int = 5,
    num_features: int = 1 << 18,
    embedding_dim: int = 64,
) -> DataFrame:
    """mentions(doc_id, mention) × entities(id, name) →
    (doc_id, mention, entity_id, jaccard_dist, cosine).

    Returns the best entity per (doc_id, mention) that survives both the
    LSH block and the cosine floor."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    m = (
        mentions.select("doc_id", "mention")
        .filter(F.length("mention") >= 3)
        .distinct()
        .withColumn("_shingles", _char_shingles(F.col("mention")))
    )
    e = (
        entities.select(F.col("id").alias("entity_id"), F.col("name"))
        .filter(F.length("name") >= 3)
        .distinct()
        .withColumn("_shingles", _char_shingles(F.col("name")))
    )

    tf = HashingTF(
        inputCol="_shingles", outputCol="_features", numFeatures=num_features, binary=True
    )
    m_feat = tf.transform(m).filter(F.size("_shingles") > 0)
    e_feat = tf.transform(e).filter(F.size("_shingles") > 0)

    lsh = MinHashLSH(inputCol="_features", outputCol="_hashes", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(e_feat)

    pairs = model.approxSimilarityJoin(
        m_feat, e_feat, jaccard_max_distance, distCol="jaccard_dist"
    ).select(
        F.col("datasetA.doc_id").alias("doc_id"),
        F.col("datasetA.mention").alias("mention"),
        F.col("datasetB.entity_id").alias("entity_id"),
        F.col("datasetB.name").alias("name"),
        "jaccard_dist",
    )

    emb = embed_udf(embedding_dim)
    scored = pairs.withColumn(
        "cosine", cosine_col(emb(F.col("mention")), emb(F.col("name")))
    ).filter(F.col("cosine") >= min_cosine)

    w = Window.partitionBy("doc_id", "mention").orderBy(
        F.col("cosine").desc(), F.col("jaccard_dist").asc(), F.col("entity_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("doc_id", "mention", "entity_id", "jaccard_dist", "cosine")
    )


def detect_mentions(documents: DataFrame) -> DataFrame:
    """Mention detection (P17 stand-in for spaCy NER, entity_extractor.py:16-28):
    link anchor texts inside rich-text spans are the high-precision mention
    source in this corpus — they are exactly what a human linked.

    Native exprs only: explode spans → regexp_extract_all anchors."""
    anchors = documents.select(
        F.col("doc_id"),
        F.explode(
            F.expr(r"flatten(transform(spans, s -> regexp_extract_all(coalesce(s.text, ''), '\\[([^\\]]*)\\]', 1)))")
        ).alias("mention"),
    )
    return anchors.filter(F.length(F.trim("mention")) > 0).select(
        "doc_id", F.lit("ANCHOR").alias("label"), F.trim(F.col("mention")).alias("mention")
    )
