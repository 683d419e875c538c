"""SparkSession factory tuned for the KG-construction workload.

Local-mode testing defaults; every knob is the one you would also set on a
multi-executor cluster (AQE, Arrow batch size bounded because span arrays
and embeddings make wide rows — see SURVEY.md §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "knowledge_nexus_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the local core count — at cluster
    scale this is sized to ~2-3× total executor cores instead.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism in local mode; never the 200 default
        n = master.split("[")[-1].rstrip("]*")
        shuffle_partitions = int(n) if n.isdigit() else cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # the corpus contains deliberate hub entities (a hot obj key owns
        # ~25% of triples); default skew thresholds (256 MiB) never fire at
        # realistic partition sizes — make AQE split skewed partitions at
        # the sizes this workload actually produces
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "4m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # span arrays + embeddings are wide rows: bound Arrow batches
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # shuffle/spill scratch on tmpfs: the sandbox's / is one virtual
        # disk whose bandwidth serializes shuffle I/O regardless of core
        # count; a real cluster stripes this across per-node local SSDs
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/knx-spark-local"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
