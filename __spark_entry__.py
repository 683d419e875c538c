"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG-construction pipeline over sf0.001 via the
flat-text connector; ``queries``/``oracle_sql`` expose the operator suite
from SURVEY.md §2 (KG ops, dedup family, similarity search, text analysis,
TPC-H-style plans, event windows) with DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents → spans → extract triples → orphan clean →
    MERGE-distinct edges (the reference's ingest pipeline end-to-end)."""
    from knowledge_nexus_spark.pipeline import PipelineConfig, build_graph
    from knowledge_nexus_spark.sources.flat_text import flat_docs_to_span_docs

    flat = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = flat_docs_to_span_docs(flat)
    result = build_graph(spark, docs, PipelineConfig(render_content=True))
    return result.edges.select("subj", "pred", "obj", "context")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from knowledge_nexus_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from knowledge_nexus_spark.plans.driver_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
