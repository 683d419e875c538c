"""SQL surface (Q4): expose the graph as Spark SQL temp views.

The reference's schema-QA path has an LLM generate Cypher executed against
Neo4j (query_controller.py:98-105,151-162). The engine-relevant executable
surface here is plain Spark SQL over nodes/edges/chunks views — any
generated query is just ``spark.sql(...)``; no custom executor exists or
is needed."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_graph_views(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    chunks: DataFrame | None = None,
) -> None:
    nodes.createOrReplaceTempView("nodes")
    edges.createOrReplaceTempView("edges")
    if chunks is not None:
        chunks.createOrReplaceTempView("chunks")
    # grouped adjacency convenience view (G4 materialization shape)
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW adjacency AS
        SELECT subj AS id, collect_list(struct(pred, obj)) AS out_edges
        FROM edges GROUP BY subj
        """
    )


def sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
