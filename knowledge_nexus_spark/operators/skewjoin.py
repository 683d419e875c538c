"""Explicit hot-key split join — the manual form of the skew defence.

AQE's skew-join handling only fires when runtime stats catch the skew
(post-shuffle partition sizes); a *known* pathological key set — hub
entities, null-like sentinel ids, celebrity users — is better split
statically so the plan shape is pinned regardless of stats. The split
is semantics-preserving for inner equi-joins because {hot, cold}
partitions the key space: every joined row lands in exactly one branch.

Cost shape at 100 TB: the hot branch avoids the shuffle entirely (the
dim slice for a bounded hot-key list is tiny by construction, so it
broadcasts), while the cold branch shuffle-joins a key distribution
whose heaviest key is now below the skew threshold — no straggler
reducer. The union adds no exchange: both branches are already in their
final shape.

The equality claim is proven under the driver's value gate
(``events_skew_join`` in plans/driver_queries.py hashes equal to the
plain-join DuckDB oracle) and by a pytest property check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_split_join(
    fact: DataFrame, dim: DataFrame, key: str, hot_keys: list
) -> DataFrame:
    """Inner-join ``fact`` to ``dim`` on ``key``, routing rows whose key
    is in ``hot_keys`` through a broadcast branch and the rest through
    the ordinary shuffle join. ``hot_keys`` must be a bounded,
    driver-side list (heavy hitters — by contract a handful, never
    data-scale). With an empty list this degrades to the plain join."""
    if not hot_keys:
        return fact.join(dim, key)
    is_hot = F.col(key).isin(hot_keys)
    hot = fact.where(is_hot).join(F.broadcast(dim.where(is_hot)), key)
    cold = fact.where(~is_hot).join(dim.where(~is_hot), key)
    return hot.unionByName(cold)
