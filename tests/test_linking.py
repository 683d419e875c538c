"""Entity linking (J10): LSH blocking finds exact and near matches, cosine
re-rank picks the best, mention detection pulls link anchors."""

from pyspark.sql import functions as F

from knowledge_nexus_spark.datagen import CorpusConfig, generate_documents
from knowledge_nexus_spark.operators.linking import detect_mentions, link_entities


def test_exact_and_near_matches(spark):
    mentions = spark.createDataFrame(
        [
            ("d1", "apache spark engine"),
            ("d1", "knowledge graph"),
            ("d2", "apache sprak engine"),  # typo → near match
            ("d3", "zzzzqqqq"),  # garbage → no match
        ],
        ["doc_id", "mention"],
    )
    entities = spark.createDataFrame(
        [
            ("e1", "apache spark engine"),
            ("e2", "knowledge graph"),
            ("e3", "totally unrelated entity"),
        ],
        ["id", "name"],
    )
    got = {
        (r.doc_id, r.mention): (r.entity_id, r.jaccard_dist)
        for r in link_entities(mentions, entities, min_cosine=0.3).collect()
    }
    assert got[("d1", "apache spark engine")][0] == "e1"
    assert got[("d1", "apache spark engine")][1] == 0.0
    assert got[("d1", "knowledge graph")][0] == "e2"
    assert got.get(("d2", "apache sprak engine"), ("e1",))[0] == "e1"
    assert ("d3", "zzzzqqqq") not in got


def test_best_match_wins(spark):
    mentions = spark.createDataFrame([("d", "graph index")], ["doc_id", "mention"])
    entities = spark.createDataFrame(
        [("close", "graph index node"), ("exact", "graph index")], ["id", "name"]
    )
    rows = link_entities(mentions, entities, min_cosine=0.1).collect()
    assert len(rows) == 1 and rows[0].entity_id == "exact"


def test_native_linking_recovers_source_names(spark):
    """link_entities_native: every first-char-dropped part-name mention must
    link to an entity with the mention's own source name (duplicated names
    tie-break to the lowest entity_id, so compare names, not keys)."""
    from knowledge_nexus_spark.operators.linking import link_entities_native

    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    entities = part.select(
        F.col("p_partkey").cast("long").alias("entity_id"),
        F.col("p_name").alias("name"),
    )
    mentions = part.select(
        F.col("p_partkey").cast("long").alias("mention_id"),
        F.expr("substr(p_name, 2)").alias("mention"),
    )
    linked = link_entities_native(mentions, entities, threshold=0.5)
    joined = (
        linked.join(
            part.select(
                F.col("p_partkey").cast("long").alias("mention_id"),
                F.col("p_name").alias("true_name"),
            ),
            "mention_id",
        )
        .join(entities, "entity_id")
    )
    n_mentions = mentions.count()
    rows = joined.collect()
    assert len(rows) == n_mentions, "every corrupted mention must link"
    # The winner is the source name — unless dropping the first char lands
    # exactly on ANOTHER entity's name ("cold widget" → "old widget"),
    # where the exact match correctly outranks the corrupted parent.
    assert all(r.name == r.true_name or r.name == r.mention for r in rows)
    exact = [r for r in rows if r.name == r.mention]
    assert all(r.jaccard == 1.0 for r in exact)


def test_detect_mentions_extracts_anchors(spark):
    docs = generate_documents(spark, CorpusConfig(n_docs=40, seed=3))
    m = detect_mentions(docs)
    rows = m.collect()
    assert rows, "corpus embeds markdown links, anchors must surface"
    assert all(r.label == "ANCHOR" and r.mention for r in rows)
    # no markdown syntax survives in mentions
    assert all("[" not in r.mention and "](" not in r.mention for r in rows)
