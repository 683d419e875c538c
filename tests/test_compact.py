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
