"""Every DuckDB oracle must return driver-comparable types.

The driver's value-hash compare normalizes cells per Arrow type, and
DuckDB silently widens sum(BIGINT) to HUGEINT, which Arrow surfaces as
decimal128(38,0) — so an oracle that forgets CAST(... AS BIGINT) around
an integer aggregate hash-mismatches a value-identical Spark result
(this killed kg_pagerank at the round-3 gate and events_trailing at the
round-4 local gate). This test sweeps the whole registry: no oracle may
emit a decimal column, and every oracle must at least execute. Pure
DuckDB — no Spark session needed."""

import duckdb
import pyarrow as pa
import pytest

from knowledge_nexus_spark.plans.driver_queries import ORACLE_SQL

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("SET threads=2")
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def test_no_oracle_emits_decimal_columns(con):
    offenders = []
    for name, sql in sorted(ORACLE_SQL.items()):
        tbl = con.execute(sql).fetch_arrow_table()
        for field in tbl.schema:
            if pa.types.is_decimal(field.type):
                offenders.append((name, field.name, str(field.type)))
    assert not offenders, (
        "oracles returning decimal columns (DuckDB HUGEINT widening — "
        f"add CAST(... AS BIGINT/DOUBLE)): {offenders}"
    )
