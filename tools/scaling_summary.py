"""Derive the scaling-evidence summary straight from BENCH/SCALING_HUNT.jsonl.

The hunt log is the record of truth (every gate, repeat wall, and probe,
nothing dropped); the prose in BENCH/BASELINE.md and
BENCH/SCALING_LATEST.md must agree with it. Round 3's verdict flagged a
doc/record mismatch once and round 4's executive summary is hand-edited
after every execution, so this tool recomputes the aggregate claims from
the log itself — run it before editing any summary paragraph and paste
its numbers.

Groups pairs by corpus size (the `triples` field of the N half), then
reports, per corpus and pooled:
  - pairs run / quiet pairs (the log's own `quiet_window` flag — the
    classification applied at measurement time, never re-derived here),
  - efficiency list, median, mean, count >= 0.8,
  - per-protocol (v2 vs v3-midgate) quiet medians.

Usage: python tools/scaling_summary.py [path-to-jsonl]
"""

from __future__ import annotations

import json
import os
import statistics
import sys


def load_pairs(path: str) -> list[dict]:
    pairs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if rec.get("kind") == "pair":
                pairs.append(rec)
    return pairs


def describe(tag: str, pairs: list[dict]) -> None:
    if not pairs:
        print(f"{tag}: no pairs")
        return
    effs = [p["efficiency"] for p in pairs]
    quiet = [p for p in pairs if p.get("quiet_window")]
    qeffs = sorted(p["efficiency"] for p in quiet)
    print(f"{tag}: {len(pairs)} pairs, {len(quiet)} quiet")
    if qeffs:
        print(
            f"  quiet effs: {qeffs}\n"
            f"  quiet median {statistics.median(qeffs):.3f}  "
            f"mean {statistics.mean(qeffs):.3f}  "
            f">=0.8: {sum(1 for e in qeffs if e >= 0.8)}/{len(qeffs)}"
        )
    rejected = sorted(p["efficiency"] for p in pairs if not p.get("quiet_window"))
    if rejected:
        print(f"  rejected (not quiet): {rejected}")


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "BENCH", "SCALING_HUNT.jsonl"
    )
    pairs = load_pairs(path)

    by_corpus: dict[int, list[dict]] = {}
    for p in pairs:
        by_corpus.setdefault(p["n"]["triples"], []).append(p)
    for triples in sorted(by_corpus):
        describe(f"corpus {triples} triples", by_corpus[triples])

    describe("ALL (pooled, this log)", pairs)

    by_proto: dict[str, list[dict]] = {}
    for p in pairs:
        by_proto.setdefault(p.get("protocol", "v2"), []).append(p)
    for proto in sorted(by_proto):
        describe(f"protocol {proto}", by_proto[proto])


if __name__ == "__main__":
    main()
