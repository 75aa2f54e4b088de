"""Property-based cross-validation of sort semantics.

Mirrors the reference's randomized comparator tests
(core/.../mapred/TestComparators.java:49-120: random schemas, random sort
criteria, random tuples; binary compare ≡ object compare). Here: random
typed columns, random OrderBy criteria (direction × null order), random
rows with nulls — Spark's sort must equal a pure-Python reference
comparator implementing NULL_SMALLEST/NULL_BIGGEST semantics.
"""

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st

from pangool_spark.orderby import NullOrder, Order, OrderBy

_COL_TYPES = {
    "i": ("INT", st.one_of(st.none(), st.integers(-100, 100))),
    "l": ("BIGINT", st.one_of(st.none(), st.integers(-(2**40), 2**40))),
    "d": ("DOUBLE", st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False))),
    "s": ("STRING", st.one_of(st.none(), st.text(alphabet="abcXYZ019 ", max_size=6))),
    "b": ("BOOLEAN", st.one_of(st.none(), st.booleans())),
}


@st.composite
def sort_cases(draw):
    n_cols = draw(st.integers(1, 3))
    kinds = draw(st.lists(st.sampled_from(list(_COL_TYPES)), min_size=n_cols, max_size=n_cols))
    cols = [(f"c{i}", *_COL_TYPES[k]) for i, k in enumerate(kinds)]
    n_rows = draw(st.integers(0, 8))
    rows = [tuple(draw(strat) for _, _, strat in cols) for _ in range(n_rows)]
    criteria = [
        (
            name,
            draw(st.sampled_from([Order.ASC, Order.DESC])),
            draw(st.sampled_from([NullOrder.NULL_SMALLEST, NullOrder.NULL_BIGGEST])),
        )
        for name, _, _ in cols
    ]
    ddl = ", ".join(f"{name} {sql}" for name, sql, _ in cols)
    return ddl, rows, criteria


def _python_reference_sort(rows, criteria, col_index):
    """Stable per-criterion sorts, last key first — the reference comparator
    semantics: NULL_SMALLEST = null below every value (so first under ASC,
    last under DESC); NULL_BIGGEST the inverse."""
    out = list(rows)
    for name, order, null_order in reversed(criteria):
        idx = col_index[name]
        reverse = order is Order.DESC
        nulls_first = (
            null_order is NullOrder.NULL_SMALLEST
            if order is Order.ASC
            else null_order is NullOrder.NULL_BIGGEST
        )
        # python sorted is stable even with reverse=True (ties keep order);
        # ranks place nulls on the requested side of the FINAL order
        null_rank = (1 if nulls_first else 0) if reverse else (0 if nulls_first else 1)
        nonnull_rank = 1 - null_rank

        def key(row, idx=idx, null_rank=null_rank, nonnull_rank=nonnull_rank):
            v = row[idx]
            return (null_rank, False) if v is None else (nonnull_rank, v)

        out = sorted(out, key=key, reverse=reverse)
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=sort_cases())
def test_spark_sort_matches_reference_comparator(spark, case):
    ddl, rows, criteria = case
    df = spark.createDataFrame(rows, ddl)
    ob = OrderBy()
    for name, order, null_order in criteria:
        ob.add(name, order, null_order)
    got = [tuple(r) for r in df.orderBy(*ob.columns()).collect()]

    col_index = {name: i for i, name in enumerate(df.columns)}
    expected = _python_reference_sort(rows, criteria, col_index)

    # compare the sequences of sort-key projections (ties among equal keys
    # are legitimately unordered in a distributed sort)
    def keys(seq):
        return [tuple(r[col_index[name]] for name, _, _ in criteria) for r in seq]

    assert keys(got) == keys(expected)
