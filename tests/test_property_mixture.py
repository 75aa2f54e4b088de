"""Property check for mixture_sample's oracle-replication claim: the
per-stratum thresholds computed in Python (binary64, fixed op order
``T * w / c * buckets`` truncated) must equal what DuckDB computes from the
same counts and weight literals — the bit-for-bit contract the
mixture_sample_docs oracle relies on. No Spark needed."""

import duckdb
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

_BUCKETS = 1_000_000


@st.composite
def counts_and_weights(draw):
    n = draw(st.integers(2, 6))
    counts = [draw(st.integers(1, 10_000_000)) for _ in range(n)]
    # weights as 2-decimal literals, like callers write them
    raw = [draw(st.integers(1, 100)) for _ in range(n)]
    weights = [r / 100 for r in raw]
    return counts, weights


@settings(max_examples=50, deadline=None)
@given(counts_and_weights())
def test_thresholds_replicate_in_duckdb(cw):
    counts, weights = cw
    t = min(c / w for c, w in zip(counts, weights))
    py = [int(t * w / c * _BUCKETS) for c, w in zip(counts, weights)]
    values = ", ".join(
        f"({i}, {c}, CAST({w!r} AS DOUBLE))"
        for i, (c, w) in enumerate(zip(counts, weights))
    )
    sql = f"""
    WITH cw(s, c, w) AS (VALUES {values}),
    t AS (SELECT MIN(c / w) AS t FROM cw)
    SELECT s, CAST(FLOOR(t.t * w / c * {_BUCKETS}) AS BIGINT) FROM cw CROSS JOIN t ORDER BY s
    """
    got = [r[1] for r in duckdb.connect().execute(sql).fetchall()]
    assert got == py
