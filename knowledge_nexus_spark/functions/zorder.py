"""Z-order (Morton) interleaved clustering keys — the multi-column
data-skipping layout for 100 TB scans.

A table range-partitioned and sorted by ONE column skips files only for
filters on that column; a box filter on (user, value) still scans
everything. Interleaving the bits of both dimensions into one Morton key
and laying files out by key ranges bounds BOTH dimensions inside every
key range: fixing the top 2k bits of the key fixes the top k bits of
each dimension, so a file covering one bucket of `2^(2*bits-2k)` keys
spans at most a `2^(bits-k)`-wide box per dimension. File-level min/max
stats (parquet row groups, Iceberg/Delta manifests) then prune a box
filter to the handful of files whose boxes intersect it — this is the
same mechanism Delta's OPTIMIZE ZORDER BY and Iceberg's z-ordered sort
orders use.

Everything here is pure JVM bit arithmetic (shiftleft / & / |) — whole-
stage codegen, zero Python, and exactly reproducible by any engine with
64-bit integers, so the keys sit under the cross-engine value gate. The
bit-spreading uses the classic magic-mask doubling ("Interleave bits by
Binary Magic Numbers", the public-domain Stanford bit-twiddling
collection), not a per-bit loop: 5 mask steps instead of `bits`
shift-and-or terms.

Reference parity note: the reference system has no multi-dimensional
layout machinery at all (its store is a row-at-a-time graph database);
this module is part of the driver-mandated 100 TB extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) steps spreading the low 32 bits of x so bit i lands at
# bit 2i. Masks are the 64-bit "binary magic numbers"; every value stays
# below 2^63 so BIGINT arithmetic never touches the sign bit.
_SPREAD_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def part1by1(col: Column, bits: int = 16) -> Column:
    """Spread the low `bits` bits of a non-negative integral column so
    bit i lands at bit 2i (a "part1by1" spread). Values are clipped to
    `bits` bits first — the clip is part of the function's contract so
    any engine reproduces identical keys even on out-of-range input."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    x = col.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    for shift, mask in _SPREAD_STEPS:
        if shift >= bits:
            # a step only matters once the spread width exceeds it
            continue
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton key of two non-negative integral columns: bit i of `a`
    lands at bit 2i, bit i of `b` at bit 2i+1. With bits=16 the key is
    32 bits; bits<=31 keeps the key inside a signed 64-bit BIGINT.

    SIZE `bits` TO COVER THE DOMAIN (bits >= ceil(log2(max_value+1))):
    values beyond 2^bits-1 wrap modulo 2^bits by the clip, which keeps
    the key deterministic and cross-engine identical but DESTROYS the
    box-bounding property — a wrapped high value shares key ranges with
    low values, so a file's raw min/max box spans the whole domain and
    nothing is skipped. Layout callers should pre-scale or bucket
    unbounded dimensions (e.g. quantile-rank them) before keying."""
    return part1by1(a, bits).bitwiseOR(F.shiftleft(part1by1(b, bits), 1))


def zorder_layout(
    df: DataFrame, a: str, b: str, bits: int = 16, n_files: int = 64
) -> DataFrame:
    """Lay `df` out for two-dimensional data skipping: range-partition by
    the Morton key of (a, b) and sort within partitions by it, so each
    output file covers one contiguous key range = one bounded box in
    (a, b) space. Written as parquet, every row group's min/max stats on
    `a` and `b` are tight, and a box filter prunes to the intersecting
    files. The only shuffle is the range partitioner's (sampled, narrow:
    key + payload); the sort is per-partition."""
    key = zorder_key(F.col(a), F.col(b), bits).alias("_zkey")
    return (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
    )


def sql_spread_ctes(
    cols: list[str], src: str, bits: int = 16, prefix: str = "s"
) -> tuple[str, str]:
    """The ANSI-SQL mirror of `part1by1` as a chain of CTE steps — one
    CTE per mask step, applied to every column in `cols` at once via
    `SELECT * REPLACE` (a single nested expression would duplicate each
    input 2^5 times). `src` must be a CTE/table whose columns include
    `cols`, already masked to `bits` bits by the caller. Returns
    (cte_fragment, last_cte_name); append the fragment after `src`'s
    definition and read the spread columns from the last CTE. Kept in
    this module so the DuckDB oracle and the Spark plan share one
    definition of the spread sequence."""
    steps = [(s, m) for s, m in _SPREAD_STEPS if s < bits]
    lines = []
    last = src
    for i, (shift, mask) in enumerate(steps, start=1):
        repl = ", ".join(
            f"(({c} | ({c} << {shift})) & {mask}) AS {c}" for c in cols
        )
        lines.append(f"{prefix}{i} AS (SELECT * REPLACE ({repl}) FROM {last})")
        last = f"{prefix}{i}"
    return ",\n".join(lines), last
