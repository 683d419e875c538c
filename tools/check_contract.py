"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and an order-insensitive value hash (columns sorted by name,
rows sorted, values stringified). Exit nonzero on any mismatch.

Usage: python tools/check_contract.py [sf_dir] [query_name ...]
(no query names = run all)
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, decimal.Decimal):
        # Tag Decimals so an oracle that silently widens to HUGEINT /
        # decimal128 (DuckDB sum(BIGINT)) hash-MISMATCHES against Spark's
        # plain int, like the driver's gate does — round-3's kg_pagerank
        # red cell passed locally precisely because str(Decimal) == str(int).
        return f"dec:{v}"
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from knowledge_nexus_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("contract-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, osql = e.queries(), e.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query name(s): {sorted(unknown)}", file=sys.stderr)
            print(f"known: {sorted(qs)}", file=sys.stderr)
            spark.stop()
            return 2
        qs = {k: v for k, v in qs.items() if k in only}
    else:
        df = e.entry(spark)
        n = df.count()
        print(f"entry: {n} rows, schema={[f.name for f in df.schema.fields]}")
        assert n >= 0

    failures = []
    for name, fn in qs.items():
        try:
            got_df = fn(spark, sf)
            got_rows = [tuple(r) for r in got_df.collect()]
            got_cols = got_df.columns
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in osql:
            print(f"ok   {name}: {len(got_rows)} rows (rows-only)")
            continue
        try:
            want = con.sql(osql[name])
            want_cols = [d[0] for d in want.description]
            # Fetch through Arrow, not fetchall(): Arrow surfaces type
            # divergences (e.g. DuckDB sum(INTEGER) -> HUGEINT -> float64)
            # that native-python fetch silently papers over, and it is the
            # likeliest fetch path of the driver-side gate.
            tbl = want.arrow()
            want_rows = [tuple(d[c] for c in want_cols) for d in tbl.to_pylist()]
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"duckdb error: {ex}"))
            print(f"FAIL {name}: duckdb error: {ex}")
            continue
        problems = []
        if sorted(c.lower() for c in got_cols) != sorted(c.lower() for c in want_cols):
            problems.append(f"cols {got_cols} vs {want_cols}")
        if len(got_rows) != len(want_rows):
            problems.append(f"rows {len(got_rows)} vs {len(want_rows)}")
        if not problems:
            gh = value_hash(got_rows, got_cols)
            wh = value_hash(want_rows, want_cols)
            if gh != wh:
                problems.append("value-hash mismatch")
                gset = set(
                    "\x1f".join(norm_cell(r[i]) for i in sorted(range(len(got_cols)), key=lambda i: got_cols[i]))
                    for r in got_rows
                )
                wset = set(
                    "\x1f".join(norm_cell(r[i]) for i in sorted(range(len(want_cols)), key=lambda i: want_cols[i]))
                    for r in want_rows
                )
                only_g = list(gset - wset)[:3]
                only_w = list(wset - gset)[:3]
                problems.append(f"spark-only={only_g} duck-only={only_w}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}: {len(got_rows)} rows, hash match")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
