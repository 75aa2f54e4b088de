"""Property checks for the quantized-ln information-theory contract:
the Python replication of the operator's exact expression order must
equal DuckDB's SQL block bit-for-bit on random contingency tables (the
cross-engine claim mutual_info_events relies on), and the axioms
(MI ≥ 0, MI ≤ min(H), U ∈ [0,1]) must hold after quantization. No Spark
needed — the Spark side is pinned by check_oracles and pytest already."""

import math

import duckdb
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

Q = 1_000_000.0


def _qsum(counts):
    # replicate _qsum(_xlnx(o)): round half-up like Spark/DuckDB, not
    # Python's banker's rounding
    total = 0
    for o in counts:
        t = float(o) * math.log(float(o)) * Q if o > 0 else 0.0
        total += math.floor(t + 0.5)
    return float(total)


def _py_mi(cells):
    """cells: dict[(a, b)] -> count. Replicates the operator's exact
    expression order (queries.mutual_info_events SQL / infotheory
    module)."""
    n = sum(cells.values())
    ra, cb = {}, {}
    for (a, b), o in cells.items():
        ra[a] = ra.get(a, 0) + o
        cb[b] = cb.get(b, 0) + o
    s_ab, s_a, s_b = (
        _qsum(cells.values()),
        _qsum(ra.values()),
        _qsum(cb.values()),
    )
    nd = float(n)
    h_a_raw = math.log(nd) - s_a / (Q * nd)
    h_b_raw = math.log(nd) - s_b / (Q * nd)
    mi_raw = math.log(nd) + (s_ab - s_a - s_b) / (Q * nd)
    n_a, n_b = len(ra), len(cb)

    def z(raw, degenerate):
        return 0.0 if degenerate else round(max(raw, 0.0), 9)

    mi = z(mi_raw, n_a == 1 or n_b == 1)
    u_ab = (
        None
        if n_a == 1
        else (0.0 if n_b == 1 else round(max(mi_raw / h_a_raw, 0.0), 9))
    )
    return {
        "n": n,
        "n_a": n_a,
        "n_b": n_b,
        "h_a": z(h_a_raw, n_a == 1),
        "h_b": z(h_b_raw, n_b == 1),
        "mi": mi,
        "u_a_given_b": u_ab,
    }


@st.composite
def tables(draw):
    na = draw(st.integers(1, 5))
    nb = draw(st.integers(1, 5))
    cells = {}
    for a in range(na):
        for b in range(nb):
            c = draw(st.integers(0, 5000))
            if c:
                cells[(a, b)] = c
    # ensure every row/col index is non-degenerate-by-accident is NOT
    # required: empty rows/cols simply don't exist as categories
    if not cells:
        cells[(0, 0)] = draw(st.integers(1, 5000))
    return cells


@settings(max_examples=60, deadline=None)
@given(tables())
def test_quantized_mi_replicates_in_duckdb(cells):
    py = _py_mi(cells)
    values = ", ".join(f"({a}, {b}, {o})" for (a, b), o in cells.items())
    sql = f"""
    WITH cells AS (
      SELECT a, b, CAST(o AS BIGINT) AS o
      FROM (VALUES {values}) AS t(a, b, o)
    ), tot AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST(SUM(CAST(round(CAST(o AS DOUBLE) * ln(CAST(o AS DOUBLE))
                                 * 1000000.0) AS BIGINT)) AS DOUBLE) AS s_ab
      FROM cells
    ), ma AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_a,
             CAST(SUM(CAST(round(CAST(ra AS DOUBLE) * ln(CAST(ra AS DOUBLE))
                                 * 1000000.0) AS BIGINT)) AS DOUBLE) AS s_a
      FROM (SELECT CAST(SUM(o) AS BIGINT) AS ra FROM cells GROUP BY a)
    ), mb AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_b,
             CAST(SUM(CAST(round(CAST(cb AS DOUBLE) * ln(CAST(cb AS DOUBLE))
                                 * 1000000.0) AS BIGINT)) AS DOUBLE) AS s_b
      FROM (SELECT CAST(SUM(o) AS BIGINT) AS cb FROM cells GROUP BY b)
    ), calc AS (
      SELECT n, n_a, n_b,
             ln(CAST(n AS DOUBLE)) - s_a / (1000000.0 * CAST(n AS DOUBLE))
               AS h_a_raw,
             ln(CAST(n AS DOUBLE)) - s_b / (1000000.0 * CAST(n AS DOUBLE))
               AS h_b_raw,
             ln(CAST(n AS DOUBLE))
               + (s_ab - s_a - s_b) / (1000000.0 * CAST(n AS DOUBLE))
               AS mi_raw
      FROM tot, ma, mb
    )
    SELECT n, n_a, n_b,
           CASE WHEN n_a = 1 THEN 0.0
                ELSE ROUND(greatest(h_a_raw, 0.0), 9) END,
           CASE WHEN n_b = 1 THEN 0.0
                ELSE ROUND(greatest(h_b_raw, 0.0), 9) END,
           CASE WHEN n_a = 1 OR n_b = 1 THEN 0.0
                ELSE ROUND(greatest(mi_raw, 0.0), 9) END,
           CASE WHEN n_a = 1 THEN NULL
                WHEN n_b = 1 THEN 0.0
                ELSE ROUND(greatest(mi_raw / h_a_raw, 0.0), 9) END
    FROM calc
    """
    n, n_a, n_b, h_a, h_b, mi, u_ab = duckdb.connect().execute(sql).fetchone()
    assert (n, n_a, n_b) == (py["n"], py["n_a"], py["n_b"])
    assert h_a == py["h_a"] and h_b == py["h_b"]
    assert mi == py["mi"] and u_ab == py["u_a_given_b"]


@settings(max_examples=60, deadline=None)
@given(tables())
def test_information_axioms_survive_quantization(cells):
    py = _py_mi(cells)
    # MI is clamped non-negative and bounded by min marginal entropy
    # (up to the quantization residue the clamp can't remove)
    assert py["mi"] >= 0.0
    assert py["mi"] <= min(py["h_a"], py["h_b"]) + 1e-5
    if py["u_a_given_b"] is not None:
        assert 0.0 <= py["u_a_given_b"] <= 1.0 + 1e-5
    # entropies bounded by ln(cardinality)
    assert py["h_a"] <= math.log(max(py["n_a"], 1)) + 1e-5
