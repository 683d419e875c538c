"""Property-based check (hypothesis): the salted two-phase aggregate is
EXACTLY the single-phase aggregate on arbitrary inputs — duplicate keys,
hot keys, negative values, empty frames. The driver gate only sees the
generated events table; this pins the associativity argument (decimal
partials merge losslessly) on adversarial shapes."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

ROW = st.tuples(
    st.integers(min_value=0, max_value=3),      # group key (small → hot keys)
    st.integers(min_value=0, max_value=99),     # id (salt source)
    st.integers(min_value=-10**6, max_value=10**6),  # value in centi-units
)

SCHEMA = "k int, id int, cv long"


def _salted(df, n_salts=4):
    partial = df.groupBy(
        "k", F.pmod(F.col("id"), F.lit(n_salts)).alias("salt")
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("cv").cast("decimal(28,6)")).alias("ps"),
    )
    return partial.groupBy("k").agg(
        F.sum("pn").alias("n"), F.sum("ps").alias("total")
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(ROW, max_size=24))
def test_salted_equals_single_phase(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA) if rows else spark.createDataFrame(
        [], SCHEMA
    )
    got = {
        (r.k, r.n, r.total) for r in _salted(df).collect()
    }
    want = {
        (k, len(vs), Decimal(sum(vs)).quantize(Decimal("0.000001")))
        for k in {r[0] for r in rows}
        for vs in [[cv for (kk, _, cv) in rows if kk == k]]
    }
    assert got == want
