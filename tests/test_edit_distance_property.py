"""Property-based check (hypothesis): the length-band-blocked edit-distance
pair generator equals the brute-force all-pairs predicate on arbitrary
small corpora — the losslessness proof of the blocking, exercised on
shapes (empty strings, equal lengths at bucket boundaries, duplicates)
the generated corpus never produces."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from knowledge_nexus_spark.operators.dedup import edit_distance_pairs

TEXT = st.text(alphabet="ab", max_size=12)
LEN_TOL = 3
MAX_DIST = 2


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(texts):
    out = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if (
                abs(len(texts[i]) - len(texts[j])) <= LEN_TOL
                and _lev(texts[i], texts[j]) <= MAX_DIST
            ):
                out.add((i, j))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(TEXT, max_size=14))
def test_blocked_pairs_equal_brute_force(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = (
        spark.createDataFrame(rows, "doc_id long, text string")
        if rows
        else spark.createDataFrame([], "doc_id long, text string")
    )
    got = {
        (r.a_id, r.b_id)
        for r in edit_distance_pairs(
            df, prefix=100, len_tol=LEN_TOL, max_dist=MAX_DIST
        ).collect()
    }
    assert got == _brute(texts)
