"""Property-based check (hypothesis): the one-shuffle windowed as-of join
equals a brute-force per-row oracle on arbitrary small inputs — including
duplicate timestamps, duplicate payloads, empty sides, strict mode, and
tolerance. The driver-gate oracle only sees the generated corpus; this
pins the operator on adversarial shapes the corpus never produces."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from knowledge_nexus_spark.operators.temporal import asof_join

ROW = st.tuples(
    st.integers(min_value=0, max_value=2),   # key
    st.integers(min_value=0, max_value=12),  # ts (seconds)
    st.integers(min_value=0, max_value=4),   # payload value
)

LEFT_SCHEMA = "k int, ts int, lv int"
RIGHT_SCHEMA = "k int, ts int, rv int"


def _brute(left_rows, right_rows, strict, tol):
    out = set()
    for i, (k, t, lv) in enumerate(left_rows):
        cands = [
            (rt, rv)
            for (rk, rt, rv) in right_rows
            if rk == k and (rt < t if strict else rt <= t)
        ]
        if tol is not None:
            cands = [(rt, rv) for (rt, rv) in cands if t - rt <= tol]
        m = max(cands) if cands else (None, None)
        out.add((i, k, t, lv, m[0], m[1]))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(ROW, max_size=12),
    right=st.lists(ROW, max_size=12),
    strict=st.booleans(),
    tol=st.one_of(st.none(), st.integers(min_value=0, max_value=6)),
)
def test_asof_join_matches_brute_force(spark, left, right, strict, tol):
    # an index column disambiguates duplicate left rows for set comparison
    l = spark.createDataFrame(
        [(i, k, t, lv) for i, (k, t, lv) in enumerate(left)],
        "i int, " + LEFT_SCHEMA,
    )
    r = spark.createDataFrame(right or [], RIGHT_SCHEMA)
    got = {
        (row.i, row.k, row.ts, row.lv, row.matched_ts, row.matched_rv)
        for row in asof_join(
            l,
            r.withColumnRenamed("ts", "rts").withColumnRenamed("rv", "rv"),
            on="k",
            left_ts="ts",
            right_ts="rts",
            right_cols=["rts", "rv"],
            strict=strict,
            tolerance_seconds=tol,
        )
        .withColumnRenamed("matched_rts", "matched_ts")
        .collect()
    }
    assert got == _brute(left, right, strict, tol)
