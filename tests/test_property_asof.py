"""Property-based cross-validation of the as-of join against pandas
``merge_asof`` — an independent, widely-trusted implementation of the same
semantics (backward search, allow_exact_matches ↔ allow_exact).

Random keyed, timestamped tables with duplicate left timestamps, keys
missing from either side, and ties between left and right timestamps; the
window-form `asof_join` must agree with pandas row-for-row in both the
``<=`` and strict ``<`` modes.
"""

import pytest

hypothesis = pytest.importorskip("hypothesis")
import pandas as pd

from hypothesis import HealthCheck, given, settings, strategies as st

from pangool_spark.operators.joins import asof_join


@st.composite
def asof_cases(draw):
    keys = draw(st.lists(st.integers(0, 3), min_size=1, max_size=8))
    left = [
        (i, k, draw(st.integers(0, 50)))
        for i, k in enumerate(keys)
    ]
    n_right = draw(st.integers(0, 10))
    right = []
    used = set()
    for j in range(n_right):
        k = draw(st.integers(0, 3))
        t = draw(st.integers(0, 50))
        if (k, t) in used:  # keep (key, ts) unique: the documented contract
            continue
        used.add((k, t))
        right.append((k, t, float(j)))
    return left, right, draw(st.booleans()), draw(
        st.sampled_from(["backward", "forward"])
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(asof_cases())
def test_asof_join_matches_pandas_merge_asof(spark, case):
    left_rows, right_rows, allow_exact, direction = case
    left = spark.createDataFrame(left_rows, "event_id LONG, k LONG, ts LONG")
    right = spark.createDataFrame(
        right_rows or [(99, -1, 0.0)], "k LONG, ts LONG, price DOUBLE"
    )
    got = {
        r.event_id: (r.asof_price, r.asof_ts)
        for r in asof_join(
            left, right, on="k", ts_col="ts",
            allow_exact=allow_exact, direction=direction,
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["event_id", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(
        right_rows or [(99, -1, 0.0)], columns=["k", "ts", "price"]
    ).sort_values("ts")
    exp_df = pd.merge_asof(
        lp, rp, on="ts", by="k", allow_exact_matches=allow_exact,
        suffixes=("", "_r"), direction=direction,
    )
    # pandas drops the matched right ts; recover it by re-joining on price
    for _, row in exp_df.iterrows():
        eid = int(row["event_id"])
        if pd.isna(row["price"]):
            assert got[eid] == (None, None), eid
        else:
            price = float(row["price"])
            match_ts = next(t for (k, t, p) in right_rows if p == price)
            assert got[eid] == (price, match_ts), eid
