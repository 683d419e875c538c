#!/usr/bin/env python3
"""spark-submit entry point for the KG-construction pipeline.

Cluster usage (the north rule's invocation shape):

    cd /root/repo && zip -r /tmp/knx.zip knowledge_nexus_spark
    spark-submit --py-files /tmp/knx.zip scripts/run_pipeline.py \\
        --input  s3://bucket/documents/   \\
        --workdir s3://bucket/kg_run_001/ \\
        --with-chunks --with-linking --canonicalize

Local smoke:

    python scripts/run_pipeline.py --generate 5000 --workdir /tmp/knx_run

The job is resumable: re-submitting with the same --workdir skips every
stage whose snapshot committed (storage/checkpoint.py), which is how a
killed run continues — the north-star requirement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", help="parquet dir of documents(doc_id, spans, ...)")
    p.add_argument("--generate", type=int, default=0,
                   help="instead of --input: generate a seeded corpus of N docs")
    p.add_argument("--workdir", default=None,
                   help="stage checkpoint directory (batch mode). Default: "
                        "/tmp/knx_workdir_<fingerprint> derived from the input "
                        "source and config flags, so a rerun against a "
                        "DIFFERENT corpus or config never resumes another "
                        "run's committed stage snapshots")
    p.add_argument("--with-chunks", action="store_true")
    p.add_argument("--with-linking", action="store_true")
    p.add_argument("--canonicalize", action="store_true")
    p.add_argument("--create-unprocessed", action="store_true")
    p.add_argument("--master", default=None, help="override (default: session env)")
    p.add_argument("--refresh-state", default=None, metavar="DIR",
                   help="incremental mode: diff the input snapshot against the "
                        "state in DIR, re-extract only changed docs, merge "
                        "(operators/refresh.py — refresh_updated_pages parity)")
    p.add_argument("--stream", default=None, metavar="DIR",
                   help="streaming mode: drain document parquet drops from DIR "
                        "through the Structured Streaming CDC MERGE into the "
                        "edges snapshot (streaming/ingest.py); re-invoke after "
                        "new drops land — the stream checkpoint skips "
                        "already-merged files")
    p.add_argument("--stream-out", default=None, metavar="DIR",
                   help="streaming mode: root for the edges snapshot + stream "
                        "checkpoint (default: <stream dir>_out)")
    args = p.parse_args()

    from knowledge_nexus_spark.pipeline import PipelineConfig, run_pipeline
    from knowledge_nexus_spark.session import get_spark

    spark = get_spark("knx-pipeline", master=args.master)

    if args.stream:
        from knowledge_nexus_spark.streaming.ingest import incremental_ingest

        out = args.stream_out or args.stream.rstrip("/") + "_out"
        t0 = time.perf_counter()
        incremental_ingest(
            spark, args.stream, f"{out}/edges", f"{out}/checkpoint", process_all=True
        )
        summary = {
            "wall_sec": round(time.perf_counter() - t0, 2),
            "mode": "stream",
            "edges": spark.read.parquet(f"{out}/edges").count(),
            "out": out,
        }
        print(json.dumps(summary))
        spark.stop()
        return

    if args.generate:
        from knowledge_nexus_spark.datagen import CorpusConfig, generate_documents

        docs = generate_documents(spark, CorpusConfig(n_docs=args.generate))
    elif args.input:
        docs = spark.read.parquet(args.input)
    else:
        p.error("one of --input / --generate / --stream is required")

    cfg = PipelineConfig(
        with_chunks=args.with_chunks,
        with_linking=args.with_linking,
        canonicalize=args.canonicalize,
        create_unprocessed=args.create_unprocessed,
    )
    if args.workdir is None:
        # Stage snapshots are keyed only by stage name inside the workdir,
        # so the workdir itself must be unique per (input, config): fold
        # both into the default path. An explicit --workdir overrides.
        import hashlib

        src = f"generate:{args.generate}" if args.generate else f"input:{args.input}"
        sig = hashlib.md5(f"{src}|{cfg}".encode()).hexdigest()[:12]
        args.workdir = f"/tmp/knx_workdir_{sig}"
    t0 = time.perf_counter()
    if args.refresh_state:
        from knowledge_nexus_spark.operators.refresh import refresh_updated

        res = refresh_updated(spark, docs, args.refresh_state, cfg)
        summary = {
            "wall_sec": round(time.perf_counter() - t0, 2),
            "mode": "refresh",
            "reextracted_docs": res.n_changed,
            "nodes": res.nodes.count(),
            "edges": res.edges.count(),
            "chunks": res.chunks.count() if res.chunks is not None else 0,
            "state": args.refresh_state,
        }
    else:
        ck, nodes, edges, chunks = run_pipeline(spark, docs, args.workdir, cfg)
        summary = {
            "wall_sec": round(time.perf_counter() - t0, 2),
            "nodes": nodes.count(),
            "edges": edges.count(),
            "chunks": chunks.count() if chunks is not None else 0,
            "stages": ck.metrics,
            "workdir": args.workdir,
        }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
