"""cascade_delete: FK-graph erasure propagation."""

import pytest

from pangool_spark.operators.upsert import cascade_delete


def _fixture(spark):
    cust = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "ck bigint, name string"
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3), (14, None)],
        "ok bigint, ck bigint",
    )
    items = spark.createDataFrame(
        [(10, 1, "x"), (10, 2, "y"), (12, 1, "z"), (13, 1, "w"), (99, 1, "q")],
        "ok bigint, ln bigint, sku string",
    )
    tables = {
        "cust": (cust, "ck"),
        "orders": (orders, "ok"),
        "items": (items, ["ok", "ln"]),
    }
    edges = [("cust", "orders", "ck"), ("orders", "items", "ok")]
    return tables, edges


def test_three_level_cascade(spark):
    tables, edges = _fixture(spark)
    seeds = spark.createDataFrame([(1,)], "ck bigint")
    surv, report = cascade_delete(tables, "cust", seeds, edges)
    assert sorted(r.ck for r in surv["cust"].collect()) == [2, 3]
    # orders 10,11 die (ck=1); NULL-ck order 14 survives
    assert sorted(r.ok for r in surv["orders"].collect()) == [12, 13, 14]
    # items of order 10 die; orphan item 99 survives
    assert sorted((r.ok, r.ln) for r in surv["items"].collect()) == [
        (12, 1), (13, 1), (99, 1)
    ]
    rep = {r.table_name: (r.n_deleted, r.n_kept) for r in report.collect()}
    assert rep == {"cust": (1, 2), "orders": (2, 3), "items": (2, 3)}


def test_untouched_table_passes_through(spark):
    tables, edges = _fixture(spark)
    extra = spark.createDataFrame([(5,)], "z bigint")
    tables["extra"] = (extra, "z")
    seeds = spark.createDataFrame([(2,)], "ck bigint")
    surv, report = cascade_delete(tables, "cust", seeds, edges)
    assert [r.z for r in surv["extra"].collect()] == [5]
    rep = {r.table_name: (r.n_deleted, r.n_kept) for r in report.collect()}
    assert rep["extra"] == (0, 1)
    assert rep["orders"] == (1, 4)


def test_misordered_edges_raise(spark):
    tables, edges = _fixture(spark)
    seeds = spark.createDataFrame([(1,)], "ck bigint")
    with pytest.raises(ValueError, match="topologically ordered"):
        cascade_delete(tables, "cust", seeds, list(reversed(edges)))


def test_unknown_table_raises(spark):
    tables, edges = _fixture(spark)
    seeds = spark.createDataFrame([(1,)], "ck bigint")
    with pytest.raises(ValueError, match="unknown table"):
        cascade_delete(
            tables, "cust", seeds, [("cust", "nope", "ck")]
        )
