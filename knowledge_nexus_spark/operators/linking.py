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


def link_entities_native(
    mentions: DataFrame,
    entities: DataFrame,
    threshold: float = 0.5,
    num_tables: int = 8,
) -> DataFrame:
    """Dual-engine entity linking: md5-MinHash banded blocking over
    character 3-gram shingles, exact-Jaccard verify on candidates only,
    deterministic best-entity re-rank (jaccard desc, entity_id asc).

    The fully-oracled sibling of ``link_entities``: Spark ML's MinHash
    family has no SQL analogue, so J10 was pytest-only; this variant's
    signature is ``dedup.md5_hash64`` (reproducible in any SQL engine),
    making mention→entity matches value-hash-verifiable at the driver
    gate. Same scale shape: the (band, key) equi-join is the blocking —
    never a cross product — and candidates travel as ids only, shingle
    sets re-joined per side after the pair dedup.

    Corpora repeat surface forms heavily (row count >> vocabulary), so
    ALL pairwise work — banding, the bucket join, the Jaccard verify —
    runs over DISTINCT strings only; mention_ids and duplicate entity
    names re-join after the per-string winner is decided. Without this
    the bucket join is quadratic in the duplication factor: at 10× rows
    over the same vocabulary each (band, key) bucket holds 10× copies
    per side → 100× candidate pairs, all landing on the hot bucket's
    task (observed live: one straggler task burning 13 min in
    ArrayIntersect at sf0.1). Equivalence of the re-expansion: jaccard
    is a pure function of the two strings, and the tie-break
    (jaccard desc, entity_id asc) makes the per-name MIN entity_id the
    only duplicate that can ever win, so ranking name representatives
    is identical to ranking the full expansion.

    mentions(mention_id, mention) × entities(entity_id, name) →
    (mention_id, mention, entity_id, jaccard)."""
    from knowledge_nexus_spark.operators.dedup import md5_hash64

    m_rows = (
        mentions.select("mention_id", "mention")
        .filter(F.length("mention") >= 3)
        .distinct()
    )
    m = (
        m_rows.select("mention")
        .distinct()
        .withColumn("sh", _char_shingles(F.col("mention")))
        .withColumn("sz", F.size("sh"))
    )
    e = (
        entities.select("entity_id", "name")
        .filter(F.length("name") >= 3)
        .groupBy("name")
        .agg(F.min("entity_id").alias("entity_id"))
        .withColumn("sh", _char_shingles(F.col("name")))
        .withColumn("sz", F.size("sh"))
    )

    def banded(df, keys):
        tok = df.select(*keys, F.explode("sh").alias("g"))
        sig = tok.groupBy(*keys).agg(*[
            F.min(
                md5_hash64(F.concat_ws(":", F.lit(str(i)), F.col("g")))
            ).alias(f"_k{i}")
            for i in range(num_tables)
        ])
        return sig.select(
            *keys,
            F.explode(
                F.array(*[
                    F.struct(F.lit(i).alias("band"), F.col(f"_k{i}").alias("key"))
                    for i in range(num_tables)
                ])
            ).alias("bk"),
        ).select(*keys, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    cand = (
        banded(m, ["mention"])
        .join(banded(e, ["name"]), ["band", "key"])
        .select("mention", "name")
        .dropDuplicates(["mention", "name"])
    )

    scored = (
        cand.join(m.select("mention", "sh", "sz"), "mention")
        .join(
            e.select(
                "name",
                "entity_id",
                F.col("sh").alias("esh"),
                F.col("sz").alias("esz"),
            ),
            "name",
        )
        .withColumn("inter", F.size(F.array_intersect("sh", "esh")))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz") + F.col("esz") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )

    w = Window.partitionBy("mention").orderBy(
        F.col("jaccard").desc(), F.col("entity_id").asc()
    )
    best = (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("mention", "entity_id", "jaccard")
    )
    return m_rows.join(best, "mention").select(
        "mention_id", "mention", "entity_id", "jaccard"
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
