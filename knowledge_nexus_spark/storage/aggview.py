"""Incremental aggregate-view maintenance — delta merge instead of rescan.

The reference recomputes everything from scratch on every run (its only
incrementality is the page-level refresh gate,
graph_rag/data_source/notion_provider.py:315-319); an analytics engine
over an append-heavy 100 TB corpus cannot re-aggregate history to update
a dashboard. The standard fix is a materialized GROUP BY view kept
fresh by merging each new batch's PARTIAL aggregate states into the
stored view — the same partial-final split Spark's own HashAggregate
uses across the shuffle, lifted to the storage layer.

Only decomposable aggregates participate (count, sum, min, max — and
avg as sum/count derived at read time): their partial states merge with
the same operator, so

    merge(view(batch_1), partial(batch_2)) == view(batch_1 ∪ batch_2)

exactly, in any grouping and any batch order. That associativity is
what the pytest pins, and what makes the whole path hash-oracle-able:
however many deltas were applied, the stored view must equal a plain
GROUP BY over all rows ever seen.

Cost model at scale: one maintenance round shuffles |delta partials| +
|touched view groups| rows — never the history. With the view stored
bucketed on the group key (storage/bucketed.py) even the view side's
shuffle disappears; this module keeps plain DataFrames so the algebra
is visible and composable.

Sums accumulate in DECIMAL(28,6), not double: float partial-sums are
order-sensitive (merge order would change low bits), which would break
both the associativity test and cross-engine equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (view column, source expression builder, merge function)
_STATE_COLS = ("n_rows", "v_sum", "v_min", "v_max")


def agg_partial(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """One batch's partial aggregate state per group: count / decimal sum
    / min / max of ``value_col``. Map-side combine applies as usual —
    the shuffle carries one row per (partition, group)."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(v).alias("n_rows"),
        F.sum(v.cast("decimal(28,6)")).alias("v_sum"),
        F.min(v).alias("v_min"),
        F.max(v).alias("v_max"),
    )


def merge_states(view: DataFrame, delta_partial: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a delta's partial states into the stored view.

    union + re-aggregate with each state's own merge operator (count and
    sum merge by SUM, min by MIN, max by MAX). Groups only in the delta
    appear; groups only in the view pass through unchanged; overlapping
    groups combine exactly. One shuffle over view+delta rows."""
    both = view.select(*keys, *_STATE_COLS).unionByName(
        delta_partial.select(*keys, *_STATE_COLS)
    )
    return both.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("v_sum").alias("v_sum"),
        F.min("v_min").alias("v_min"),
        F.max("v_max").alias("v_max"),
    )


def finalize(view: DataFrame, keys: list[str]) -> DataFrame:
    """Read-time projection of the maintained states, deriving avg from
    sum/count so it is exact regardless of how many merges happened."""
    return view.select(
        *keys,
        F.col("n_rows").cast("long").alias("n_rows"),
        # round the exact DECIMAL sum BEFORE the double cast: an exact
        # .xxx5 boundary rounds identically in both engines as a decimal
        # but diverges once it is a binary double (shortest-repr HALF_UP
        # vs raw-binary round)
        F.round(F.col("v_sum"), 4).cast("double").alias("v_sum"),
        # divide as DOUBLE, not decimal: the two engines pick different
        # division scales for decimal/bigint, which can flip the 4th
        # rounded digit; double-of-exact-decimal ÷ int is bit-identical
        F.round(F.col("v_sum").cast("double") / F.col("n_rows"), 4).alias("v_avg"),
        F.col("v_min"),
        F.col("v_max"),
    )
