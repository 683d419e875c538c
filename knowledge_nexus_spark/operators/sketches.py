"""Deterministic cardinality sketch (HyperLogLog) computable bit-for-bit
in ANY SQL engine — the oracle-able counterpart of approx_count_distinct.

Spark's native ``approx_count_distinct`` uses HLL++ with an engine-private
hash, so no external oracle can reproduce it. This implementation fixes
every degree of freedom:

  hash     = md5-derived 60-bit integer (operators/dedup.md5_hash64 —
             identical in Spark and DuckDB)
  bucket   = hash mod m        (m = 256 registers, p = 8)
  rho      = leading-zero rank of the remaining 52 bits, via length(bin(w))
             (both engines print minimal binary strings)
  registers M_j = max(rho) per bucket — a plain groupBy, shuffle on
             (group, bucket): m·|groups| rows, trivially scale-safe
  estimate = alpha_m · m² / Σ 2^(−M_j), with the sum carried as an EXACT
             integer Σ 2^(53−M_j) (≤ 2⁶¹, fits a long) so summation order
             cannot wiggle the last ulp — the final value is a pure
             function of the input set in both engines.

Raw HLL estimator only (no small/large-range corrections — they need ln(),
whose last-ulp behavior differs across libms and would break cross-engine
equality). Accuracy ~1.04/√m ≈ 6.5% at m=256, pinned in pytest; the
regime n ≳ 2.5·m is the documented operating range.

At 10^12 rows this is ONE partial-aggregating shuffle of m rows per group —
exactly how you'd run a distinct-count over 100 TB without a count-distinct
shuffle of the raw keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knowledge_nexus_spark.operators.dedup import md5_hash64

M_REGISTERS = 256  # p = 8
_RHO_BITS = 52  # 60-bit hash minus 8 bucket bits
_ALPHA = 0.7213 / (1.0 + 1.079 / M_REGISTERS)
# The estimator numerator as ONE precomputed double literal: both engines
# then perform the identical single division, so operation order can't
# diverge in the last ulp.
_NUMERATOR = _ALPHA * M_REGISTERS * M_REGISTERS * float(1 << 53)


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """HLL register table (group_cols..., j, M) — max rho per bucket.

    ``group_cols`` may include PARTITION dimensions beyond the logical
    group (e.g. a day column): registers are MERGEABLE, so per-partition
    sketches roll up into the global sketch with ``hll_merge_registers``
    — the 100 TB incremental pattern (sketch each new partition once,
    merge m rows per group, never rescan history).
    """
    # NULLs never count toward COUNT(DISTINCT): without this filter a NULL
    # value row becomes a phantom (j=NULL, M=NULL) register that inflates
    # n_buckets in hll_estimate while contributing nothing to s_obs,
    # biasing the estimate high. (Any SQL oracle must filter identically.)
    df = df.filter(F.col(value_col).isNotNull())
    h = md5_hash64(F.col(value_col).cast("string"))
    bucket = F.pmod(h, F.lit(M_REGISTERS))
    # shiftright, NOT floor(h/m): h is up to 2^60, beyond double's exact
    # integer range, so a float division would corrupt low bits.
    w = F.shiftright(h, 8)
    # rho = 1 + leading zeros of w in a _RHO_BITS field; bin(w) prints the
    # minimal binary form, so bit_length(w) = length(bin(w)) for w > 0.
    rho = F.when(w == 0, F.lit(_RHO_BITS + 1)).otherwise(
        F.lit(_RHO_BITS + 1) - F.length(F.bin(w))
    )
    return (
        df.select(*group_cols, bucket.alias("j"), rho.alias("rho"))
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("M"))
    )


def hll_merge_registers(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables down to ``group_cols``: max(M) per bucket.
    HLL registers form a max-semilattice, so any grouping of the input
    (days, sources, shards) merges to the IDENTICAL global registers."""
    return regs.groupBy(*group_cols, "j").agg(F.max("M").alias("M"))


def hll_estimate(regs: DataFrame, group_col: str) -> DataFrame:
    """Raw-HLL estimate from a register table keyed by ``group_col``.
    Returns (group_col, hll_est DOUBLE) rounded to 4dp."""
    # Σ 2^(−M_j) carried exactly: Σ 2^(53−M_j) over observed buckets plus
    # 2^53 per empty bucket, all in long arithmetic (order-independent).
    scaled = regs.withColumnRenamed(group_col, "g").groupBy("g").agg(
        # expr: pyspark's shiftleft() only takes a literal int shift amount
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - M)")).alias("s_obs"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    s_total = F.col("s_obs") + (F.lit(M_REGISTERS) - F.col("n_buckets")) * F.lit(
        1 << 53
    ).cast("long")
    est = F.lit(_NUMERATOR) / s_total
    return scaled.select(
        F.col("g").alias(group_col), F.round(est, 4).alias("hll_est")
    )


def hll_distinct(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Approximate COUNT(DISTINCT value_col) per group_col.

    Returns (group_col, hll_est DOUBLE) with hll_est rounded to 4dp.
    Deterministic: equal inputs give equal outputs in Spark and DuckDB.
    Composition of ``hll_registers`` + ``hll_estimate`` (single-partition
    case of the mergeable-register pipeline)."""
    return hll_estimate(hll_registers(df, [group_col], value_col), group_col)


CMS_DEPTH = 4  # hash rows
CMS_WIDTH = 256  # buckets per row


def _seed_explode(n: int, alias: str):
    """Explode a row into ``n`` seeded copies (the hash-row fan-out both
    sketch families share)."""
    return F.explode(F.array(*[F.lit(i) for i in range(n)])).alias(alias)


def _probe_pos(seed_col, val_col, modulus: int):
    """THE probe-hash recipe: md5_hash64(seed || ':' || value) mod m.

    Single definition shared by cms_build / cms_estimate / bloom_build /
    bloom_might_contain so build and probe sides can never drift apart
    (the SQL oracles duplicate it deliberately — they must stay an
    independent derivation)."""
    return F.pmod(
        md5_hash64(F.concat(seed_col.cast("string"), F.lit(":"), val_col)),
        F.lit(modulus),
    )


def cms_build(df: DataFrame, value_col: str) -> DataFrame:
    """Count-min sketch of value_col frequencies: (r, b, cnt) cells.

    Each input value lands in CMS_DEPTH cells, one per hash row r, at
    bucket b = md5_hash64(r || ':' || value) mod CMS_WIDTH. The explode
    multiplies rows ×DEPTH *before* the aggregation, but the groupBy
    partially aggregates map-side, so the shuffle carries at most
    DEPTH·WIDTH rows per input partition — at 10^12 rows this is the
    only way to get per-key frequency estimates without shuffling keys.
    Deterministic: md5 hash, integer counters — any SQL engine agrees.
    """
    cells = df.select(F.col(value_col).cast("string").alias("v")).select(
        _seed_explode(CMS_DEPTH, "r"), F.col("v")
    )
    bucket = _probe_pos(F.col("r"), F.col("v"), CMS_WIDTH)
    return (
        cells.select("r", bucket.alias("b"))
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point-query the sketch: est(key) = min over rows of cell counts.

    Returns (key_col, cms_est BIGINT), an upper bound on the true count
    (classic CM overestimate). The sketch is ≤ DEPTH·WIDTH rows, so the
    join broadcasts regardless of how many keys are probed."""
    # The internal stringified-key alias must not collide with the
    # caller's key column name (key_col == "v" is legal).
    probes = keys.select(F.col(key_col)).distinct().select(
        F.col(key_col),
        F.col(key_col).cast("string").alias("__cms_v"),
        _seed_explode(CMS_DEPTH, "r"),
    )
    probes = probes.withColumn(
        "b", _probe_pos(F.col("r"), F.col("__cms_v"), CMS_WIDTH)
    ).drop("__cms_v")
    return (
        probes.join(F.broadcast(sketch), ["r", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_est"))
    )


def cms_sql(table: str, value_col: str, key_col: str) -> str:
    """DuckDB oracle: same hash, same cells, same min — bit-equal counts."""
    d, w = CMS_DEPTH, CMS_WIDTH
    h = (
        "CAST(('0x' || substr(md5(CAST(s.r AS VARCHAR) || ':' || {v}), 1, 15))"
        " AS BIGINT) % " + str(w)
    )
    return f"""
    WITH seeds AS (SELECT unnest(range({d})) AS r),
    vals AS (SELECT CAST({value_col} AS VARCHAR) AS v FROM {table}),
    cells AS (
      SELECT s.r AS r, {h.format(v='vals.v')} AS b, count(*) AS cnt
      FROM vals CROSS JOIN seeds s GROUP BY 1, 2),
    keys AS (SELECT DISTINCT {key_col}, CAST({key_col} AS VARCHAR) AS v
             FROM {table}),
    probes AS (
      SELECT k.{key_col}, s.r AS r, {h.format(v='k.v')} AS b
      FROM keys k CROSS JOIN seeds s)
    SELECT p.{key_col},
           CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_est
    FROM probes p LEFT JOIN cells c ON c.r = p.r AND c.b = p.b
    GROUP BY p.{key_col}
    """


BLOOM_HASHES = 3  # k hash rows
BLOOM_BITS = 4096  # positions per row (partitioned bloom: k disjoint arrays)


def bloom_build(df: DataFrame, value_col: str) -> DataFrame:
    """Partitioned Bloom filter of value_col as relational rows (i, pos).

    Row i holds the distinct positions md5_hash64(i || ':' || v) mod
    BLOOM_BITS of every build-side value — ≤ HASHES·BITS rows total, so
    the filter always broadcasts. (Spark's native AQE runtime bloom
    [spark.sql.optimizer.runtime.bloomFilter.enabled] injects the same
    pruning automatically but with an engine-private hash; this explicit
    variant exists so an external oracle can reproduce membership.)"""
    probes = df.select(F.col(value_col).cast("string").alias("v")).select(
        "v", _seed_explode(BLOOM_HASHES, "i")
    )
    pos = _probe_pos(F.col("i"), F.col("v"), BLOOM_BITS)
    return probes.select("i", pos.alias("pos")).distinct()


def bloom_might_contain(
    bloom: DataFrame, keys: DataFrame, key_col: str
) -> DataFrame:
    """(key_col, might_contain BOOLEAN): true iff all k probe positions
    are set. No false negatives; false positives at the classic
    (1 - e^(-kn/m))^k rate. The broadcast left-join + count==k is the
    whole membership test — no bitset type needed."""
    # Collision-free internal alias: key_col == "v" is legal.
    probes = keys.select(F.col(key_col)).distinct().select(
        F.col(key_col),
        F.col(key_col).cast("string").alias("__bloom_v"),
        _seed_explode(BLOOM_HASHES, "i"),
    )
    probes = probes.withColumn(
        "pos", _probe_pos(F.col("i"), F.col("__bloom_v"), BLOOM_BITS)
    ).drop("__bloom_v")
    hit = F.broadcast(bloom.withColumn("hit", F.lit(1)))
    return (
        probes.join(hit, ["i", "pos"], "left")
        .groupBy(key_col)
        .agg((F.count("hit") == F.lit(BLOOM_HASHES)).alias("might_contain"))
    )


def hll_distinct_sql(table: str, group_col: str, value_col: str) -> str:
    """The DuckDB oracle for ``hll_distinct`` — same constants, same exact
    integer register sum."""
    m = M_REGISTERS
    rb = _RHO_BITS
    return f"""
    WITH hashed AS (
      SELECT {group_col} AS g,
             CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM {table} WHERE {value_col} IS NOT NULL),
    rho_t AS (
      SELECT g, h % {m} AS j,
             CASE WHEN h // {m} = 0 THEN {rb + 1}
                  ELSE {rb + 1} - length(bin(h // {m})) END AS rho
      FROM hashed),
    regs AS (SELECT g, j, max(rho) AS M FROM rho_t GROUP BY g, j),
    s AS (
      SELECT g, sum(CAST(1 AS BIGINT) << (53 - M)) AS s_obs, count(*) AS n_buckets
      FROM regs GROUP BY g)
    SELECT g AS {group_col},
           round(CAST({_NUMERATOR!r} AS DOUBLE)
                 / (s_obs + ({m} - n_buckets) * (CAST(1 AS BIGINT) << 53)), 4) AS hll_est
    FROM s
    """
