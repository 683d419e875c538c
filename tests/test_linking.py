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


def test_detect_mentions_extracts_anchors(spark):
    docs = generate_documents(spark, CorpusConfig(n_docs=40, seed=3))
    m = detect_mentions(docs)
    rows = m.collect()
    assert rows, "corpus embeds markdown links, anchors must surface"
    assert all(r.label == "ANCHOR" and r.mention for r in rows)
    # no markdown syntax survives in mentions
    assert all("[" not in r.mention and "](" not in r.mention for r in rows)
