"""Small-files compaction for incrementally-written tables.

Streaming CDC ingest and per-refresh bucket rewrites (streaming/ingest.py,
operators/refresh.py) each append a handful of small parquet files per
trigger; after days of triggers a 100 TB table becomes millions of
KB-sized files and every scan pays open/footer costs per file instead of
per row group. Compaction is the standing maintenance job: rewrite each
partition's file set into ~target-sized files, atomically swap.

Production equivalent: Iceberg's rewrite_data_files / OPTIMIZE. The
sandbox version preserves the two properties that matter:
  - data equality (same rows before and after, pinned by test);
  - atomic cutover via write-to-side-dir + rename, so concurrent readers
    see the old or the new file set, never a mix — same write-then-swap
    idempotency discipline as storage/merge.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), p, jvm


def dir_bytes(spark: SparkSession, path: str) -> int:
    fs, p, _ = _fs(spark, path)
    return int(fs.getContentSummary(p).getLength())


def n_data_files(spark: SparkSession, path: str) -> int:
    fs, p, jvm = _fs(spark, path)
    it = fs.listFiles(p, True)
    n = 0
    while it.hasNext():
        f = it.next().getPath().getName()
        if not f.startswith(("_", ".")):
            n += 1
    return n


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_mb: float = 128,
    sort_col: str | None = None,
) -> int:
    """Rewrite the parquet directory at ``path`` into
    ceil(bytes / target_mb) files and atomically swap it in. With
    ``sort_col`` the rewrite range-partitions on that column, so files
    carry tight min/max footer stats and later point/range scans skip
    whole files. Returns the new file count."""
    total = dir_bytes(spark, path)
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    out = (
        df.repartitionByRange(n, sort_col)
        if sort_col
        else df.repartition(n)
    )
    tmp = path.rstrip("/") + "__compact_tmp"
    out.write.mode("overwrite").parquet(tmp)

    fs, p, jvm = _fs(spark, path)
    bak = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__compact_bak")
    fs.rename(p, bak)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), p)
    fs.delete(bak, True)
    return n
