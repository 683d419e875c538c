"""Synthesize an sf1-scale dataset as 10 join-consistent key-shifted
copies of the driver's sf0.1 parquet (round-4 VERDICT #8: anchor the
scale-design claims with one 10x data point; the sandbox ships no sf1
testdata and no offline TPC-H generator).

Every fact/dim that scales with SF in TPC-H (customer, supplier, part,
orders, lineitem) plus the extension tables (events, documents,
embeddings) is replicated 10x with per-copy key offsets of
(max_key + 1), applied to primary AND foreign keys together so join
cardinalities scale exactly linearly (copy k of lineitem joins copy k of
orders/part/supplier, never across copies). region/nation stay fixed —
they are constant-size in TPC-H at every SF. Value columns (prices,
dates, text, embeddings) are byte-identical to sf0.1, so per-row work is
unchanged and a super-linear wall at sf1 exposes a super-linear plan,
which is the measurement's purpose.

Usage: python tools/make_sf1.py [src_sf_dir] [dst_dir] [copies]
       (defaults /root/testdata/sf0.1, /tmp/knx_sf1, 10)
"""

from __future__ import annotations

import os
import sys

import duckdb

# key columns to offset, per table: {column: cardinality_source_table}
OFFSETS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events:user_id"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
COPY_ONCE = ["region", "nation"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/knx_sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    # per-table (max key + 1) strides
    stride: dict[str, int] = {}
    for t, key in KEY_OF.items():
        stride[t] = (
            con.sql(f"SELECT max({key}) + 1 FROM '{src}/{t}.parquet'").fetchone()[0]
        )
    stride["events:user_id"] = (
        con.sql(f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]
    )

    for t in COPY_ONCE:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet'"
            " (FORMAT PARQUET)"
        )
        print(f"{t}: copied once")

    for t, offs in OFFSETS.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + k.k * {stride[offs[c]]} AS {c}" if c in offs else c
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', "
            f"(SELECT unnest(range({copies})) AS k) k) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({copies}x)")


if __name__ == "__main__":
    main()
