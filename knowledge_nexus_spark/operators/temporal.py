"""Temporal joins the reference lacks but a training-data / event pipeline
needs (driver-mandated extensions; the reference's only temporal operator
is the freshness timestamp comparison at /root/reference/graph_rag/
data_source/notion_provider.py:55-59).

  asof_join  — for every left row, the single most recent right row with
               right_ts <= left_ts (backward as-of; ``strict`` excludes
               exact ties). Implemented as union + keyed window
               ``last(..., ignorenulls)`` — ONE shuffle on the key, no
               per-row Python, no range explosion; the classic scalable
               as-of plan. At 10^12 rows this is a single hash-partitioned
               sort per key group. As-of matching is inherently per-key
               sequential (like sessionization), so a hot key is bounded
               by that key's own row count — pre-filter or split hot keys
               by time range upstream if one key dominates the corpus.
  range_join — left rows paired with right rows whose ts lies in
               [left_ts + lower, left_ts + upper] on the same key.
               Implemented by time-bucketing: right is keyed by
               (key, bucket); left explodes to the few candidate buckets
               its window overlaps, then an equi-join + exact range
               filter. Turns an inequality join (per-key cartesian) into
               an equi-join with bounded fan-out — the 100 TB-safe plan.

Both are pure native column expressions (whole-stage codegen end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    strict: bool = False,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join preserving ALL left columns plus
    ``matched_<c>`` for each requested right column (null when no right
    row qualifies).

    Plan: both sides project to (key, ts, side, payload) and union; a
    window per key ordered by (ts, side, right-payload) takes the last
    non-null right payload at-or-before each left row. Left's full row
    rides the union as a struct, so no join-back is needed — one shuffle
    total. Deterministic under timestamp ties: among right rows sharing
    the greatest admissible ts, the largest payload tuple (field order =
    ``right_cols``) wins; the oracle SQL mirrors this exactly.

    ``tolerance_seconds``: a match older than ``left_ts − tolerance`` is
    nulled out (pandas ``merge_asof(tolerance=...)`` semantics, inclusive
    boundary, exact integer-µs comparison). The payload internally carries
    the matched right ts (leading struct field — ties still break on it
    first, same order as without it), so no extra shuffle is needed.
    """
    right_cols = right_cols or [c for c in right.columns if c != on]

    rpayload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        rpayload.alias("_rp"),
    )
    lpayload = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        lpayload.alias("_lp"),
    )
    r = r.withColumn("_lp", F.lit(None).cast(l.schema["_lp"].dataType))

    # Inclusive: right rows sort before left at equal _t, window ends at
    # the current row. Strict: right rows sort after left, so an exact-tie
    # right row falls outside the unbounded-to-current frame.
    side_order = F.col("_side").asc() if not strict else F.col("_side").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), side_order, F.col("_rp").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_m", F.last(F.col("_rp"), ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_seconds is not None:
        gap_us = F.unix_micros(F.col("_t").cast("timestamp")) - F.unix_micros(
            F.col("_m")["__rts"].cast("timestamp")
        )
        matched = matched.withColumn(
            "_m",
            F.when(gap_us <= F.lit(int(tolerance_seconds * 1_000_000)), F.col("_m")),
        )
    out_cols = [F.col("_lp")[c].alias(c) for c in left.columns]
    out_cols += [F.col("_m")[c].alias(f"matched_{c}") for c in right_cols]
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = 0.0,
    upper_seconds: float = 0.0,
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Interval equi-join: pairs (left, right) with the same key and
    ``right_ts - left_ts`` in ``[lower_seconds, upper_seconds]``.

    The right side gets one time bucket; the left side explodes to every
    bucket its admissible window overlaps (``(upper-lower)/bucket + 1``
    buckets — a small constant), so the physical join is an equi-join on
    (key, bucket) with an exact range filter after it. Returns all left
    columns plus ``r_<c>`` for right's non-key columns.
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    # All boundary arithmetic in integer MICROSECONDS (unix_micros), never
    # floating seconds: at epoch magnitude a double carries ~0.5 µs of
    # representation error, enough to flip rows sitting on the range
    # boundary vs an exact-integer oracle.
    width_us = int(
        (bucket_seconds if bucket_seconds else max(upper_seconds - lower_seconds, 1.0))
        * 1_000_000
    )
    lo_us = int(lower_seconds * 1_000_000)
    hi_us = int(upper_seconds * 1_000_000)

    lus = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rus = F.unix_micros(F.col(right_ts).cast("timestamp"))

    def bucket(a):
        # Exact floored division on longs: (a - pmod(a, w)) is an exact
        # multiple of w, so the double division returns the exact integer
        # quotient (both operands and result are < 2^53).
        return ((a - F.pmod(a, F.lit(width_us))) / F.lit(width_us)).cast("long")

    r = right.select(
        F.col(on).alias("_k"),
        bucket(rus).alias("_b"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != on],
    )
    lo_b = bucket(lus + F.lit(lo_us))
    hi_b = bucket(lus + F.lit(hi_us))
    l = left.withColumn("_b", F.explode(F.sequence(lo_b, hi_b)))

    joined = l.join(r, (l[on] == r["_k"]) & (l["_b"] == r["_b"]), "inner").drop(
        "_k", "_b"
    )
    delta = F.unix_micros(F.col(f"r_{right_ts}").cast("timestamp")) - F.unix_micros(
        F.col(left_ts).cast("timestamp")
    )
    return joined.filter((delta >= F.lit(lo_us)) & (delta <= F.lit(hi_us)))
