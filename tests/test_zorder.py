"""Z-order key: exactness vs a bit-by-bit reference, the box-bounding
property that makes file skipping work, and plan purity."""

from pyspark.sql import functions as F

from knowledge_nexus_spark.functions.zorder import zorder_key, zorder_layout

SF = "/root/testdata/sf0.001"


def _morton_ref(a: int, b: int, bits: int = 16) -> int:
    a &= (1 << bits) - 1
    b &= (1 << bits) - 1
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_bitwise_reference(spark):
    # edge values: zeros, all-ones, clip boundary, single bits, mixed
    cases = [
        (0, 0), (1, 0), (0, 1), (65535, 65535), (65536, 2),  # clip
        (0x5555, 0xAAAA), (149, 49002), (1, 1 << 15), (12345, 54321),
    ]
    df = spark.createDataFrame(cases, "a long, b long").withColumn(
        "z", zorder_key(F.col("a"), F.col("b"), 16)
    )
    for a, b, z in df.collect():
        assert z == _morton_ref(a, b, 16), (a, b, z)


def test_zorder_key_wide_bits(spark):
    # bits=31 exercises the 16-shift spread step and the sign-bit margin
    cases = [(2**31 - 1, 2**31 - 1), (2**30, 1), (3, 2**30 + 5)]
    df = spark.createDataFrame(cases, "a long, b long").withColumn(
        "z", zorder_key(F.col("a"), F.col("b"), 31)
    )
    for a, b, z in df.collect():
        assert z == _morton_ref(a, b, 31) and z > 0, (a, b, z)


def test_zorder_buckets_bound_both_dimensions(spark):
    """Fixing the top 12 key bits fixes the top 6 bits of each dim: every
    2^20-key bucket spans at most a 1024-wide window per dimension.
    This is the data-skipping property itself — a file holding one
    bucket has tight min/max stats on BOTH columns."""
    from knowledge_nexus_spark.plans.driver_queries import q_events_zorder

    rows = q_events_zorder(spark, SF).collect()
    assert rows, "expected non-empty buckets"
    for r in rows:
        assert r["u_max"] - r["u_min"] <= 1023, r
        assert r["v_max"] - r["v_min"] <= 1023, r


def test_zorder_plan_is_pure_codegen(spark):
    from knowledge_nexus_spark.plans.driver_queries import q_events_zorder

    df = q_events_zorder(spark, SF)
    jvm = df.sparkSession.sparkContext._jvm
    plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # one shuffle total: the bucket aggregate
    assert plan.count("Exchange hashpartitioning") <= 1


def test_zorder_layout_files_cover_disjoint_key_ranges(spark, tmp_path):
    """zorder_layout range-partitions by the key: partition key ranges
    must be non-overlapping, so each parquet file's (a, b) box is
    bounded by its key range — the layout file skipping relies on."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        F.col("user_id").alias("u"),
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    out = zorder_layout(ev, "u", "v", bits=16, n_files=8)
    ranges = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("_zkey").alias("lo"), F.max("_zkey").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(ranges) > 1
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev["hi"] <= cur["lo"], (prev, cur)
