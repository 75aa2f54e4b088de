"""OrderBy DSL + null-order semantics (ref P/tuplemr/OrderBy.java,
Criteria.java; sort parity with SortComparator null handling)."""

import pytest

from pangool_spark.orderby import NullOrder, Order, OrderBy


def test_parse_dsl():
    ob = OrderBy.parse("a:asc,b:desc|null_biggest")
    assert ob.field_names == ["a", "b"]
    assert ob.elements[0].order is Order.ASC
    assert ob.elements[0].null_order is NullOrder.NULL_SMALLEST
    assert ob.elements[1].order is Order.DESC
    assert ob.elements[1].null_order is NullOrder.NULL_BIGGEST


def test_parse_source_order():
    ob = OrderBy.parse("url:asc,source:asc,ts:desc")
    assert ob.source_order is Order.ASC
    assert ob.source_order_index == 1
    assert ob.field_names == ["url", "ts"]


def test_duplicate_field_rejected():
    with pytest.raises(ValueError):
        OrderBy().add("a").add("a")


def test_prefix_invariant():
    ob = OrderBy.parse("a:asc,b:desc,c:asc")
    assert ob.starts_with(["a"]) and ob.starts_with(["a", "b"])
    assert not ob.starts_with(["b"])


@pytest.mark.parametrize(
    "order,null_order,expected",
    [
        (Order.ASC, NullOrder.NULL_SMALLEST, [None, 1, 2]),
        (Order.ASC, NullOrder.NULL_BIGGEST, [1, 2, None]),
        (Order.DESC, NullOrder.NULL_SMALLEST, [2, 1, None]),
        (Order.DESC, NullOrder.NULL_BIGGEST, [None, 2, 1]),
    ],
)
def test_null_order_spark_sort(spark, order, null_order, expected):
    # NULL_SMALLEST = null below every value; NULL_BIGGEST = above
    # (ref P/tuplemr/mapred/SortComparator.java:299-314)
    df = spark.createDataFrame([(1,), (None,), (2,)], "v INT")
    ob = OrderBy().add("v", order, null_order)
    got = [r.v for r in df.orderBy(*ob.columns()).collect()]
    assert got == expected
