"""Stage-level profile of the scaling pipeline — finds WHERE the
non-parallelizing time lives at 4N (the execution-S finding: t0 grows
with corpus size, ~6 s at 600k docs -> ~17.7 s at 1.2M docs).

Runs the exact bench_scaling pipeline (same session knobs, same
local-cluster master, same prime protocol) with the Spark event log
enabled, then parses the log into a per-stage account:

  - wall span of each stage (submit -> complete),
  - task-time skew (max task vs median task) = straggler tail,
  - inter-stage gaps where NO stage is running = driver-serial time
    (planning, AQE re-optimization, commit coordination).

Usage: python scripts/profile_scaling.py [n_docs] [n_executors]
       (defaults 1200000, 4)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_profiled(n_docs: int, n_executors: int, log_dir: str) -> float:
    from bench import ensure_corpus
    from knowledge_nexus_spark.pipeline import PipelineConfig, build_graph
    from knowledge_nexus_spark.session import get_spark

    gen = get_spark("knx-profile-gen", master="local[32]", shuffle_partitions=32)
    corpus_path = ensure_corpus(gen, n_docs)
    gen.stop()

    os.makedirs(log_dir, exist_ok=True)
    spark = get_spark(
        f"knx-profile-{n_executors}x",
        master=f"local-cluster[{n_executors},2,6144]",
        shuffle_partitions=64,
        extra_conf={
            "spark.executor.memory": "6g",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
        },
    )
    docs = spark.read.parquet(corpus_path)

    def one_run(input_df):
        from threading import Thread

        t0 = time.perf_counter()
        res = build_graph(spark, input_df, PipelineConfig(render_content=True))
        out = {}

        def w_nodes():
            res.nodes.write.format("noop").mode("overwrite").save()

        def w_edges():
            out["n"] = res.edges.count()

        t1, t2 = Thread(target=w_nodes), Thread(target=w_edges)
        t1.start(); t2.start(); t1.join(); t2.join()
        wall = time.perf_counter() - t0
        res.unpersist()
        return wall, out["n"]

    one_run(docs.limit(30_000))  # untimed prime (codegen + executors)
    docs.write.format("noop").mode("overwrite").save()  # page-cache warm
    mark = time.time() * 1000  # ms epoch separating prime from timed run
    n_runs = int(os.environ.get("PROFILE_RUNS", "1"))
    for i in range(n_runs):
        wall, n = one_run(docs)
        print(f"timed wall (run {i + 1}) {wall:.2f} s, {n} triples, {n / wall:.0f} tps")
    spark.stop()
    return mark


def _event_lines(log_dir: str):
    """Yield event-json lines from either a flat v1 log file or a Spark-4
    rolling `eventlog_v2_*` directory of (possibly zstd) `events_*` parts."""
    import pyarrow as pa

    entries = [
        os.path.join(log_dir, f)
        for f in os.listdir(log_dir)
        if not f.startswith(".")
    ]
    newest = max(entries, key=os.path.getmtime)
    if os.path.isdir(newest):
        parts = sorted(
            os.path.join(newest, f)
            for f in os.listdir(newest)
            if f.startswith("events_")
        )
    else:
        parts = [newest]
    for part in parts:
        if part.endswith(".zstd"):
            with pa.CompressedInputStream(pa.OSFile(part, "rb"), "zstd") as s:
                buf = s.read()
            text = bytes(buf).decode("utf-8", errors="replace")
        else:
            text = open(part, encoding="utf-8", errors="replace").read()
        for line in text.splitlines():
            if line:
                yield line


def analyze(log_dir: str, mark_ms: float) -> None:
    stages = {}  # (stageId, attempt) -> dict
    tasks = {}  # stageId -> [durations ms]
    task_spans = {}  # stageId -> (min launch, max finish)
    task_windows = []  # (launch, finish, stageId)
    for line in _event_lines(log_dir):
        ev = json.loads(line)
        k = ev.get("Event")
        if k == "SparkListenerStageSubmitted":
            si = ev["Stage Info"]
            stages.setdefault(
                (si["Stage ID"], si["Stage Attempt ID"]),
                {"name": si["Stage Name"], "ntasks": si["Number of Tasks"]},
            )
        elif k == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            d = stages.setdefault(
                (si["Stage ID"], si["Stage Attempt ID"]),
                {"name": si["Stage Name"], "ntasks": si["Number of Tasks"]},
            )
            d["submit"] = si.get("Submission Time")
            d["complete"] = si.get("Completion Time")
        elif k == "SparkListenerTaskEnd":
            ti = ev["Task Info"]
            sid = ev["Stage ID"]
            dur = ti["Finish Time"] - ti["Launch Time"]
            tasks.setdefault(sid, []).append(dur)
            lo, hi = task_spans.get(sid, (float("inf"), 0))
            task_spans[sid] = (min(lo, ti["Launch Time"]), max(hi, ti["Finish Time"]))
            task_windows.append((ti["Launch Time"], ti["Finish Time"], sid))

    rows = []
    for (sid, att), d in sorted(stages.items()):
        if d.get("submit") is None or d["submit"] < mark_ms:
            continue  # prime-phase stage
        ts = sorted(tasks.get(sid, [0]))
        med = ts[len(ts) // 2]
        rows.append(
            {
                "stage": sid,
                "span_s": round((d["complete"] - d["submit"]) / 1000, 2),
                "submit": d["submit"],
                "complete": d["complete"],
                "ntasks": d["ntasks"],
                "task_med_s": round(med / 1000, 2),
                "task_max_s": round(ts[-1] / 1000, 2),
                "task_sum_s": round(sum(ts) / 1000, 2),
                "name": d["name"].split("\n")[0][:70],
            }
        )
    rows.sort(key=lambda r: r["submit"])
    t_start = rows[0]["submit"]
    t_end = max(r["complete"] for r in rows)
    total = (t_end - t_start) / 1000
    for r in rows:
        r["rel_s"] = round((r["submit"] - t_start) / 1000, 2)

    # timeline occupancy: how much wall has 0 stages running (driver gaps)
    events = []
    for r in rows:
        events.append((r["submit"], 1))
        events.append((r["complete"], -1))
    events.sort()
    gap = 0.0
    depth = 0
    prev = t_start
    for t, delta in events:
        if depth == 0 and t > prev:
            gap += (t - prev) / 1000
        depth += delta
        prev = t
    print(f"\ntimed-run stage wall: {total:.2f} s; no-stage-running (driver) gaps: {gap:.2f} s")
    print(f"{'stage':>5} {'rel':>7} {'span':>7} {'ntask':>5} {'t_med':>6} {'t_max':>6} {'t_sum':>7}  name")
    for r in rows:
        print(
            f"{r['stage']:>5} {r['rel_s']:>7.2f} {r['span_s']:>7.2f} {r['ntasks']:>5} "
            f"{r['task_med_s']:>6.2f} {r['task_max_s']:>6.2f} {r['task_sum_s']:>7.2f}  {r['name']}"
        )

    # core-occupancy timeline: integrate running-task count over the timed
    # window; every core-second below `cores` is non-parallelizing exposure.
    cores = int(os.environ.get("PROFILE_CORES", "8"))
    marks = []
    for lo, hi, sid in task_windows:
        if hi < t_start:
            continue
        marks.append((max(lo, t_start), 1))
        marks.append((hi, -1))
    marks.sort()
    busy = 0
    prev = t_start
    occ_sec = 0.0  # busy-core integral (capped at cores)
    low_windows = []  # (start, end, busy) maximal windows with busy < cores
    low_start = t_start
    for t, delta in marks:
        if t > prev:
            occ_sec += min(busy, cores) * (t - prev) / 1000
            if busy < cores:
                low_windows.append((prev, t, busy))
        busy += delta
        prev = t
    wall = (t_end - t_start) / 1000
    print(
        f"\ncore occupancy: {occ_sec:.1f} busy-core-s / {cores * wall:.1f} "
        f"core-s wall = {occ_sec / (cores * wall):.2%}; "
        f"lost {(cores * wall - occ_sec) / cores:.1f} equivalent serial seconds"
    )
    # merge adjacent low windows and attribute: report the largest ones
    merged = []
    for lo, hi, b in low_windows:
        if merged and lo - merged[-1][1] < 50 and abs(b - merged[-1][2]) <= cores:
            l0, h0, b0 = merged[-1]
            dur0, dur1 = h0 - l0, hi - lo
            merged[-1] = (l0, hi, (b0 * dur0 + b * dur1) / max(dur0 + dur1, 1))
        else:
            merged.append((lo, hi, float(b)))
    merged.sort(key=lambda w: -((w[1] - w[0]) * (cores - w[2])))
    print("largest low-occupancy windows (start_rel_s, dur_s, avg_busy):")
    for lo, hi, b in merged[:10]:
        active = [
            r["stage"]
            for r in rows
            if r["submit"] <= hi and r["complete"] >= lo
        ]
        print(
            f"  +{(lo - t_start) / 1000:8.2f}s dur {(hi - lo) / 1000:6.2f}s "
            f"busy {b:4.1f}/{cores} stages {active[:6]}"
        )
    # biggest straggler stages: span much larger than median task implies tail
    print("\nstraggler candidates (span vs ideal = task_sum/cores):")
    cores = int(os.environ.get("PROFILE_CORES", "8"))
    for r in sorted(rows, key=lambda r: -(r["span_s"] - r["task_sum_s"] / cores))[:8]:
        ideal = r["task_sum_s"] / cores
        print(
            f"  stage {r['stage']}: span {r['span_s']:.2f}s vs ideal {ideal:.2f}s "
            f"(max task {r['task_max_s']:.2f}s, {r['ntasks']} tasks) {r['name'][:50]}"
        )


if __name__ == "__main__":
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    n_exec = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    os.environ["PROFILE_CORES"] = str(n_exec * 2)
    log_dir = f"/tmp/knx_profile_events_{n_exec}x"
    import shutil

    shutil.rmtree(log_dir, ignore_errors=True)
    mark = run_profiled(n_docs, n_exec, log_dir)
    analyze(log_dir, mark)
