"""Small-files compaction for incrementally-written tables.

Streaming CDC ingest and per-refresh bucket rewrites (streaming/ingest.py,
operators/refresh.py) each append a handful of small parquet files per
trigger; after days of triggers a 100 TB table becomes millions of
KB-sized files and every scan pays open/footer costs per file instead of
per row group. Compaction is the standing maintenance job: rewrite each
partition's file set into ~target-sized files, atomically swap.

Production equivalent: Iceberg's rewrite_data_files / OPTIMIZE. The
sandbox version preserves the property that matters most — data
equality (same rows before and after, pinned by test) — and makes the
cutover CRASH-SAFE rather than atomic: a filesystem without atomic
directory swap (HDFS/local both lack one; real Iceberg gets atomicity
from the metadata pointer, not the filesystem) cannot hide the instant
between moving the old dir aside and moving the new one in. Readers
never see a MIX of old and new files, but a reader racing the swap can
see the table briefly absent, and a crash inside the window leaves the
old data intact under ``__compact_bak`` (recovered automatically on the
next call). That is the honest ceiling of a directory-rename cutover;
single-writer maintenance jobs (this module's contract) are unaffected.
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
    ceil(bytes / target_mb) files and swap it in (crash-safe two-rename
    cutover; see module docstring for the exact guarantees). With
    ``sort_col`` the rewrite range-partitions on that column, so files
    carry tight min/max footer stats and later point/range scans skip
    whole files. Returns the new file count."""
    fs, p, jvm = _fs(spark, path)
    bak = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__compact_bak")
    # Recover from a crash inside a previous swap window: if the live dir
    # is missing but the bak dir exists, the old data is intact there —
    # restore it. If BOTH exist, a previous run crashed after the new dir
    # landed; the bak copy is superseded — drop it (renaming over an
    # existing dir would otherwise NEST the live data inside it).
    if fs.exists(bak):
        if not fs.exists(p):
            if not fs.rename(bak, p):
                raise IOError(f"compact: failed to restore {path} from backup")
        else:
            fs.delete(bak, True)
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

    # Two-rename cutover with CHECKED return values (Hadoop rename
    # reports failure as False, not an exception). Order matters for
    # crash-safety: after rename 1 the old data lives at bak; after
    # rename 2 the new data is live and bak is garbage — the recovery
    # preamble above handles a crash at either point.
    if not fs.rename(p, bak):
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
        raise IOError(f"compact: failed to move {path} aside")
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), p):
        fs.rename(bak, p)  # roll back — old data is still intact at bak
        raise IOError(f"compact: failed to install compacted files at {path}")
    fs.delete(bak, True)
    return n
