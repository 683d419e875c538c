#!/usr/bin/env python3
"""spark-submit entry point for the analytics query suite.

    python scripts/run_queries.py --list
    python scripts/run_queries.py kg_pipeline_triples tpch_q1 \
        --sf-dir /root/testdata/sf0.01 --show 10
    python scripts/run_queries.py dedup_minhash_lsh --out /tmp/pairs

Runs any registered query from plans/driver_queries.py (the same registry
the driver gate and bench.py use) against a parquet table directory, and
either shows, counts, or writes the result. Unknown names fail loudly —
same rule as tools/check_contract.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("queries", nargs="*", help="query names (see --list)")
    p.add_argument("--list", action="store_true", help="print query names and exit")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--show", type=int, default=0, metavar="N",
                   help="show first N rows of each result")
    p.add_argument("--out", default=None,
                   help="write each result to <out>/<name> as parquet")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from knowledge_nexus_spark.plans.driver_queries import QUERIES

    if args.list:
        for name in QUERIES:
            print(name)
        return 0
    if not args.queries:
        p.error("no query names given (use --list to see them)")
    unknown = [q for q in args.queries if q not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        print(f"known: {sorted(QUERIES)}", file=sys.stderr)
        return 2

    from knowledge_nexus_spark.session import get_spark

    spark = get_spark("knx-queries", master=args.master)
    summary = {}
    for name in args.queries:
        # Execute the plan EXACTLY ONCE and serve show/count from the
        # materialized result — chaining write + show + count on the
        # lazy frame would recompute the full query up to three times
        # and bill all of them to wall_sec (code-review finding, r4).
        t0 = time.perf_counter()
        df = QUERIES[name](spark, args.sf_dir)
        if args.out:
            df.write.mode("overwrite").parquet(f"{args.out}/{name}")
            df = spark.read.parquet(f"{args.out}/{name}")
            rows = df.count()
        else:
            df = df.localCheckpoint(eager=True)
            rows = df.count()
        wall = round(time.perf_counter() - t0, 3)
        if args.show:
            df.show(args.show, truncate=40)
        summary[name] = {"rows": rows, "wall_sec": wall}
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
