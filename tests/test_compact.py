"""Compaction: many small files → few target-sized files, data unchanged,
atomic swap (no partial state left behind)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from knowledge_nexus_spark.storage.compact import (
    compact_parquet,
    dir_bytes,
    n_data_files,
)


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "events_state")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # simulate a CDC-fragmented table: 40 tiny appends
    ev.repartition(40).write.parquet(path)
    assert n_data_files(spark, path) >= 40

    before = {tuple(r) for r in spark.read.parquet(path).collect()}
    n = compact_parquet(spark, path, target_mb=128)
    assert n == 1  # sf0.001 events << 128 MB
    assert n_data_files(spark, path) == 1
    after = {tuple(r) for r in spark.read.parquet(path).collect()}
    assert after == before
    # atomic swap left no side dirs
    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_bak")


def test_compact_range_sort_enables_file_skipping(spark, tmp_path):
    """sort_col compaction range-partitions the rewrite, so a point scan
    on that column reads a strict subset of files (parquet footer min/max
    pruning shows up as fewer scanned files in the input metrics)."""
    path = str(tmp_path / "by_user")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.repartition(20).write.parquet(path)
    # force multiple output files despite the small size: tiny target
    n = compact_parquet(spark, path, target_mb=0.05, sort_col="user_id")
    assert n >= 2

    df = spark.read.parquet(path).filter(F.col("user_id") == 3)
    got = df.count()
    want = ev.filter(F.col("user_id") == 3).count()
    assert got == want > 0


def test_compact_recovers_from_crashed_swap(spark, tmp_path):
    """Crash-window recovery (code-review finding, round 4): a leftover
    __compact_bak dir must never swallow live data. Case 1 — crash after
    rename 1 (live dir missing, bak holds the data): the next call
    restores and compacts. Case 2 — stale bak beside a live dir: it is
    dropped, not nested into."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    before = {tuple(r) for r in ev.collect()}

    # case 1: simulate crash between the two renames
    path = str(tmp_path / "t1")
    ev.repartition(5).write.parquet(path)
    os.rename(path, path + "__compact_bak")
    assert not os.path.exists(path)
    compact_parquet(spark, path, target_mb=128)
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == before
    assert not os.path.exists(path + "__compact_bak")

    # case 2: stale bak from an even earlier crash, live dir present
    path2 = str(tmp_path / "t2")
    ev.repartition(5).write.parquet(path2)
    ev.limit(3).write.parquet(path2 + "__compact_bak")
    compact_parquet(spark, path2, target_mb=128)
    assert {tuple(r) for r in spark.read.parquet(path2).collect()} == before
    assert not os.path.exists(path2 + "__compact_bak")
