"""Dump `.explain("formatted")` for a list of registry queries to
plans/r06/<query>_<tag>.txt — the before/after plan evidence for the
optimization round. Plan-only (nothing executes).

Usage: python tools/explain_dump.py <tag> <query> [query ...]
       python tools/explain_dump.py <tag> --all
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from knowledge_nexus_spark.plans.driver_queries import QUERIES
    from knowledge_nexus_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--all"]:
        names = sorted(QUERIES)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("explain_dump", master="local[4]", shuffle_partitions=4)
    rc = 0
    for name in names:
        try:
            df = QUERIES[name](spark, sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001 — dump what we can
            txt = f"FAILED TO PLAN: {ex}\n"
            rc = 1
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}")
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
