"""Registry-wide physical-plan lint: compile EVERY queries() entry and
walk its (pre-AQE) physical plan for 100 TB anti-patterns.

Per-query plan-shape pytest pins (tests/test_plan_shapes.py) protect the
hand-tuned plans; this tool is the complementary SWEEP — nothing in the
registry escapes it, including queries added in a hurry. Checks:

  HARD (exit nonzero):
  - CartesianProduct / BroadcastNestedLoopJoin anywhere outside the
    explicit whitelist (the labeled O(n^2) exact baselines whose whole
    point is the quadratic comparison).
  - BatchEvalPython (row-at-a-time Python UDF) anywhere, no exceptions.
  - Arrow-batched Python stages (ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas) outside the whitelist of operators whose
    semantics genuinely need Python (media decode, chunk+embed).

  REPORTED (PLAN_AUDIT.md, not failing):
  - shuffle (Exchange) count per query,
  - Python-stage count per query,
  - join-operator inventory per query,
  - widest parquet ReadSchema per query (column pruning telemetry: the
    documents scan must not read `spans` unless the query renders spans).

Planning only — `df._jdf.queryExecution().executedPlan()` forces analysis
+ optimization + physical planning + EnsureRequirements (so Exchange
nodes ARE present; with AQE the AdaptiveSparkPlan wrapper prints its
initial plan) but executes nothing — toString is lazy, so the sweep is
cheap at any SF. AQE may still improve joins at runtime (SMJ -> BHJ), so
sort-merge joins are reported, never flagged.

Usage: python tools/plan_audit.py [sf_dir] [--md BENCH/PLAN_AUDIT.md]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries whose contract is the quadratic comparison itself (labeled
# exact baselines a user runs at tiny SF to validate the scale path).
CARTESIAN_OK = {
    "dedup_embedding",      # exact all-pairs cosine baseline (dedup.py)
    "ann_topk",             # query-by-example: 1-row query vector x corpus
    "ann_lsh",              # same 1-row query vector join
    "ann_lsh_indexed",      # same
    "ann_ivf",              # same + 1-row centroid argmin
    "dedup_edit_distance",  # length-banded; tiny band cross product
    "tpch_q11_adapted",     # 1-row global-benchmark frame joined keyless
    "tpch_q22_adapted",     # same: BNLJ against a single aggregate row
}

# Queries whose semantics need a Python stage (Arrow-batched only).
PYTHON_OK = {
    "media_features",       # container decode (mapInPandas)
    "kg_chunks",            # chunk_and_embed (mapInPandas)
    "kg_embed",             # hash-embedding projection (pandas_udf)
    "kg_pipeline_triples",  # pandas-batched extraction parity path
    "ann_lsh",              # query-time hyperplane signatures (pandas_udf)
    "dedup_embedding_lsh",  # hyperplane signature matmul (pandas_udf);
                            # appears twice pre-AQE (band self-join
                            # aliases) — ReusedExchange collapses at run
    "kg_retrieve",          # per-chunk hash embedding (pandas_udf) feeding
                            # the composed Q3 read path
    "text_fingerprint",     # r6: Arrow winnow engine (hashlib md5 + numpy
                            # sliding minima) — bit-identical to the native
                            # array program, 2.1x faster (guide §4.2)
    "dedup_substring",      # r6: Arrow window-hash stage, same rationale
}

ROW_PYTHON = "BatchEvalPython"
ARROW_PYTHON = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas",
                "FlatMapCoGroupsInPandas")
CARTESIAN = ("CartesianProduct", "BroadcastNestedLoopJoin")
JOIN_OPS = ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
            "BroadcastNestedLoopJoin", "CartesianProduct")


def read_schemas(plan: str) -> list[tuple[str, int]]:
    """(file, n_columns) for every parquet scan in the plan string."""
    out = []
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\].*?Location.*?\[([^\]]*)\]", plan):
        cols = [c for c in m.group(1).split(",") if c.strip()]
        path = m.group(2).rsplit("/", 1)[-1] or m.group(2)
        out.append((path, len(cols)))
    if not out:  # fallback: count ReadSchema fields
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
            cols = [c for c in m.group(1).split(",") if ":" in c]
            out.append(("?", len(cols)))
    return out


def audit_one(name: str, df) -> dict:
    # executedPlan (not sparkPlan): EnsureRequirements has inserted the
    # Exchange nodes, and with AQE the AdaptiveSparkPlan wrapper prints
    # its initial plan — still ZERO execution (toString is lazy).
    plan = df._jdf.queryExecution().executedPlan().toString()
    counts = {
        "exchanges": plan.count("Exchange"),
        "row_python": plan.count(ROW_PYTHON),
        "arrow_python": sum(plan.count(p) for p in ARROW_PYTHON),
        "cartesian": sum(plan.count(p) for p in CARTESIAN),
    }
    joins = {op: plan.count(op) for op in JOIN_OPS if plan.count(op)}
    # BroadcastNestedLoopJoin is counted in both cartesian and joins; fine.
    scans = read_schemas(plan)
    widest = max((n for _, n in scans), default=0)
    errs = []
    if counts["row_python"]:
        errs.append(f"row-at-a-time Python UDF ({counts['row_python']} stage(s))")
    if counts["arrow_python"] and name not in PYTHON_OK:
        errs.append(f"unexpected Python stage ({counts['arrow_python']})")
    if counts["cartesian"] and name not in CARTESIAN_OK:
        errs.append(f"cartesian/nested-loop join ({counts['cartesian']})")
    return {"name": name, "counts": counts, "joins": joins,
            "widest_scan": widest, "scans": scans, "errs": errs}


def main() -> int:
    import __spark_entry__ as e
    from knowledge_nexus_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if args else "/root/testdata/sf0.001"
    md_path = None
    if "--md" in sys.argv:
        md_path = sys.argv[sys.argv.index("--md") + 1]

    spark = get_spark("plan_audit", master="local[4]", shuffle_partitions=4)
    qs = e.queries()
    rows, failures = [], []
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf)
            r = audit_one(name, df)
        except Exception as ex:  # noqa: BLE001 — sweep must visit all
            r = {"name": name, "counts": {}, "joins": {}, "widest_scan": 0,
                 "scans": [], "errs": [f"failed to plan: {ex}"[:200]]}
        rows.append(r)
        status = "FLAG " if r["errs"] else "ok   "
        print(f"{status}{name}: exch={r['counts'].get('exchanges', '?')} "
              f"py={r['counts'].get('arrow_python', '?')} "
              f"joins={r['joins']} widest_scan={r['widest_scan']}"
              + (f"  << {'; '.join(r['errs'])}" if r["errs"] else ""))
        if r["errs"]:
            failures.append(r)

    if md_path:
        with open(md_path, "w") as f:
            f.write("# Registry-wide physical-plan audit\n\n")
            f.write(f"Compiled (not executed) every `queries()` entry at `{sf}` "
                    f"via `queryExecution().sparkPlan()` — pre-AQE physical plans; "
                    f"AQE may further convert sort-merge joins to broadcast at "
                    f"runtime, so SMJs are reported, never flagged.\n\n")
            f.write(f"Queries: {len(rows)}; flagged: {len(failures)}.\n\n")
            f.write("| query | exchanges | python stages | joins | widest scan (cols) | flags |\n")
            f.write("|---|---|---|---|---|---|\n")
            for r in rows:
                joins = ", ".join(f"{k}×{v}" for k, v in r["joins"].items()) or "—"
                f.write(f"| `{r['name']}` | {r['counts'].get('exchanges', '?')} "
                        f"| {r['counts'].get('arrow_python', 0) + r['counts'].get('row_python', 0)} "
                        f"| {joins} | {r['widest_scan']} "
                        f"| {'; '.join(r['errs']) if r['errs'] else '—'} |\n")
        print(f"\nwrote {md_path}")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} flagged quer{'y' if len(failures) == 1 else 'ies'}")
        return 1
    print(f"\nall {len(rows)} query plans clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
