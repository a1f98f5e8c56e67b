"""Property test: all select_k physical strategies agree with a pandas
oracle on arbitrary small inputs — groups of any size (including larger
than k and singletons), duplicate scores (tie-break = payload asc), and
k beyond the group size."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from raft_spark.operators.selectk import select_k

ROW = st.tuples(
    st.integers(min_value=0, max_value=4),        # group
    st.integers(min_value=0, max_value=1_000),    # payload
    st.sampled_from([0.0, 0.25, 0.5, 0.5, 1.0, -1.0, 2.5]),  # score w/ ties
)


def _oracle(rows, k, ascending):
    pdf = pd.DataFrame(rows, columns=["g", "payload", "score"]).drop_duplicates(
        ["g", "payload"]
    )
    out = set()
    for g, grp in pdf.groupby("g"):
        srt = grp.sort_values(
            ["score", "payload"], ascending=[ascending, True], kind="mergesort"
        ).head(k)
        for rank, (_, r) in enumerate(srt.iterrows(), 1):
            out.add((g, int(r["payload"]), float(r["score"]), rank))
    return out


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(ROW, min_size=1, max_size=60),
    k=st.integers(min_value=1, max_value=8),
    ascending=st.booleans(),
)
def test_select_k_strategies_match_pandas(spark_session_holder, rows, k, ascending):
    spark = spark_session_holder
    uniq = list({(g, p): (g, p, s) for g, p, s in rows}.values())
    df = spark.createDataFrame(uniq, "g long, payload long, score double")
    want = _oracle(uniq, k, ascending)
    for strategy in ("partial", "window", "jvm"):
        got = {
            (r["g"], r["payload"], r["score"], r["rank"])
            for r in select_k(
                df, ["g"], "score", k, ascending=ascending,
                payload_cols=["payload"], strategy=strategy,
            ).collect()
        }
        assert got == want, (strategy, k, ascending)


# hypothesis forbids function-scoped fixtures interacting with @given;
# a module-level holder fixture sidesteps the health check
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark


RANK_ROW = st.tuples(
    st.integers(min_value=-50, max_value=50),
    st.integers(min_value=0, max_value=10_000),
)


@settings(max_examples=10, deadline=None)
@given(rows=st.lists(RANK_ROW, min_size=1, max_size=80, unique=True))
def test_global_rank_matches_pandas(spark_session_holder, rows):
    """global_rank (range repartition + partitioned window + offsets)
    must equal a single-node rank for any input under the total order."""
    from raft_spark.operators.reductions import global_rank

    spark = spark_session_holder
    df = spark.createDataFrame(rows, "a long, b long")
    got = {(r["a"], r["b"]): r["rank"]
           for r in global_rank(df, ["a", "b"]).collect()}
    want = {
        (a, b): i + 1
        for i, (a, b) in enumerate(sorted(rows))
    }
    assert got == want
