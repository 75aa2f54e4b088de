"""Property check for weighted_systematic_sample's oracle-replication
claim: the selection-point count ``(b·n) DIV W − (a·n) DIV W`` computed
with Python integer floor-div must equal DuckDB's ``//`` over the same
cumulative weights — including near-int64 magnitudes where a double
division would mis-floor (the defect class fixed in review: Spark
bigint '/' is DOUBLE division). Also pins the two invariants the
operator relies on: points partition to exactly n, and any row with
w ≥ W/n absorbs ≥ 1 point. No Spark needed."""

import pytest

hypothesis = pytest.importorskip("hypothesis")
import duckdb
from hypothesis import given, settings, strategies as st


@st.composite
def weights_and_n(draw):
    k = draw(st.integers(2, 40))
    big = draw(st.booleans())
    hi = 2**40 if big else 1000  # near-int64 after the n multiply
    ws = [draw(st.integers(0, hi)) for _ in range(k)]
    if sum(ws) == 0:
        ws[0] = 1
    n = draw(st.integers(1, 50))
    return ws, n


@settings(max_examples=60, deadline=None)
@given(weights_and_n())
def test_point_counts_replicate_in_duckdb(wn):
    ws, n = wn
    W = sum(ws)
    if W > (2**63 - 1) // n:  # the operator raises here; skip the regime
        return
    run, py = 0, []
    for w in ws:
        a, run = run, run + w
        py.append((run * n) // W - (a * n) // W)
    values = ", ".join(f"({i}, {w})" for i, w in enumerate(ws))
    sql = f"""
    WITH d(i, w) AS (VALUES {values}),
    r AS (SELECT i, w, SUM(w) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS b
          FROM d)
    SELECT CAST((b * {n}) // {W} - ((b - w) * {n}) // {W} AS BIGINT)
    FROM r ORDER BY i
    """
    got = [r[0] for r in duckdb.connect().execute(sql).fetchall()]
    assert got == py
    assert sum(py) == n  # the points partition exactly
    for w, p in zip(ws, py):
        if w * n >= W:
            assert p >= 1  # heavy rows always selected
        if w == 0:
            assert p == 0
