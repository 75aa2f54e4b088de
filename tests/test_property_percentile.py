"""Property check for the quantile-threshold oracle contract: Spark's
exact ``percentile`` and DuckDB's ``quantile_cont`` must agree to the
BIT on the same integer value lists — the premise behind
``quantile_filter_docs`` / ``median_quantity_per_flag``. (The mixture
sweep caught a real cast-rounding divergence; this pins the
interpolation the same way.)"""

import duckdb
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st


@st.composite
def values_and_q(draw):
    vals = draw(st.lists(st.integers(0, 10_000), min_size=1, max_size=40))
    q = draw(st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]))
    return vals, q


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(values_and_q())
def test_percentile_matches_quantile_cont(spark, vq):
    vals, q = vq
    sdf = spark.createDataFrame([(v,) for v in vals], "v LONG")
    got = sdf.selectExpr(f"percentile(v, {q}) AS p").collect()[0]["p"]
    rows = ", ".join(f"({v})" for v in vals)
    want = duckdb.connect().execute(
        f"SELECT quantile_cont(v, {q}) FROM (VALUES {rows}) AS t(v)"
    ).fetchone()[0]
    assert got == want, (vals, q)
