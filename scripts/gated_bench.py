"""Gated quiet-window bench: loop the cheap 4N reference gate and fire
ONE full `bench.py` run (sf0.1 by default) the moment a gate lands in
the quiet band. Same honesty rules as scripts/scaling_hunter.py: every
gate is appended to BENCH/SCALING_HUNT.jsonl (kind="bench_gate"), the
bench JSON is written whether or not the window held, and the in-band
probe readings inside the bench line are what decide if it becomes the
bench of record.

Usage: python scripts/gated_bench.py [max_minutes] [sf_dir] [out_json]
       (defaults 45, /root/testdata/sf0.1, BENCH/bench_gated.json)
Requires an otherwise-idle machine.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench_scaling import (  # noqa: E402
    GATE_DOCS,
    GATE_QUIET_S,
    SLEEP_BETWEEN_GATES_S,
    cpu_probe,
    run_config,
)

HUNT_JSONL = os.path.join(REPO, "BENCH", "SCALING_HUNT.jsonl")


def _append(rec: dict) -> None:
    rec["t_wall"] = round(time.time(), 1)
    with open(HUNT_JSONL, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), file=sys.stderr, flush=True)


def main() -> int:
    max_minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 45.0
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_json = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, "BENCH", "bench_gated.json")
    )
    # optional tighter SPEND gate for record attempts (same semantics as
    # the hunter's CLI gate: decides when to fire, never reclassifies) —
    # default stays the shared quiet band
    gate_quiet_s = float(sys.argv[4]) if len(sys.argv) > 4 else GATE_QUIET_S

    from bench import ensure_corpus
    from knowledge_nexus_spark.session import get_spark

    gen = get_spark("knx-gate-gen", master="local[32]", shuffle_partitions=32)
    gate_corpus = ensure_corpus(gen, GATE_DOCS)
    gen.stop()

    deadline = time.time() + max_minutes * 60
    while time.time() < deadline:
        probe = cpu_probe()
        try:
            gate = run_config(4, gate_corpus)
        except RuntimeError as e:
            # a crashed gate JVM must not end the unattended loop
            _append({"kind": "bench_gate_failed", "probe": probe, "err": str(e)})
            time.sleep(SLEEP_BETWEEN_GATES_S)
            continue
        _append(
            {"kind": "bench_gate", "probe": probe, "wall": gate["wall_sec"],
             "tps": gate["triples_per_sec"]}
        )
        if gate["wall_sec"] > gate_quiet_s:
            time.sleep(SLEEP_BETWEEN_GATES_S)
            continue
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        try:
            res = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env, capture_output=True, text=True, timeout=3600,
            )
        except subprocess.TimeoutExpired:
            _append({"kind": "bench_fire", "ok": False, "err": "timeout"})
            return 1
        line = res.stdout.strip().splitlines()[-1] if res.stdout.strip() else ""
        if res.returncode != 0 or not line.startswith("{"):
            _append(
                {"kind": "bench_fire", "ok": False,
                 "err": f"rc={res.returncode}", "tail": res.stderr[-300:]}
            )
            print("bench failed or produced no JSON line", file=sys.stderr)
            print(res.stdout[-2000:], file=sys.stderr)
            print(res.stderr[-2000:], file=sys.stderr)
            return 1
        with open(out_json, "w") as f:
            f.write(line + "\n")
        print(line)
        return 0
    print("no quiet gate inside the budget; no bench run", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
