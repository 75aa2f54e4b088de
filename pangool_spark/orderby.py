"""Sort criteria: the OrderBy DSL with per-field null ordering.

Reference (cites relative to /root/reference/):
- builder API per-field ASC/DESC — ``P/tuplemr/OrderBy.java:125-165``,
  ``P/tuplemr/Criteria.java:40-52``
- string DSL ``"f1:asc,f2:desc|null_biggest"`` — ``P/tuplemr/OrderBy.java:49-92``
- null order NULL_SMALLEST / NULL_BIGGEST — ``P/tuplemr/Criteria.java:54-56``
- schema-order marker (which source's rows sort first in a co-group) —
  ``P/tuplemr/OrderBy.java:168-194``

Spark mapping: each criterion becomes a Column sort expression using
``asc_nulls_first``/``desc_nulls_last`` etc. NULL_SMALLEST means nulls first
under ASC and last under DESC (null is the smallest value), matching the
reference's comparator (``P/tuplemr/mapred/SortComparator.java:299-314``).
Custom per-field RawComparators are intentionally NOT ported — computed
sort-key columns replace them (SURVEY §7.2).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


class Order(enum.Enum):
    ASC = "asc"
    DESC = "desc"


class NullOrder(enum.Enum):
    NULL_SMALLEST = "null_smallest"
    NULL_BIGGEST = "null_biggest"


# Marker name for the co-group source-order criterion
# (ref OrderBy.addSchemaOrder, P/tuplemr/OrderBy.java:168-194).
SOURCE_ORDER_FIELD = "__source_order__"


@dataclass(frozen=True)
class SortElement:
    name: str
    order: Order = Order.ASC
    null_order: NullOrder = NullOrder.NULL_SMALLEST

    def to_column(self, resolve=None) -> Column:
        name = resolve(self.name) if resolve else self.name
        col = F.col(name)
        nulls_first = (
            self.null_order is NullOrder.NULL_SMALLEST
            if self.order is Order.ASC
            else self.null_order is NullOrder.NULL_BIGGEST
        )
        if self.order is Order.ASC:
            return col.asc_nulls_first() if nulls_first else col.asc_nulls_last()
        return col.desc_nulls_first() if nulls_first else col.desc_nulls_last()


class OrderBy:
    """Ordered sort criteria; builder + ``parse`` DSL."""

    def __init__(self, elements: list[SortElement] | None = None):
        self.elements: list[SortElement] = list(elements or [])
        self.source_order: Order | None = None
        self.source_order_index: int | None = None

    def add(
        self,
        name: str,
        order: Order | str = Order.ASC,
        null_order: NullOrder | str = NullOrder.NULL_SMALLEST,
    ) -> "OrderBy":
        if isinstance(order, str):
            order = Order(order.lower())
        if isinstance(null_order, str):
            null_order = NullOrder(null_order.lower())
        if any(e.name == name for e in self.elements):
            raise ValueError(f"duplicate sort field {name!r}")
        self.elements.append(SortElement(name, order, null_order))
        return self

    def add_source_order(self, order: Order | str = Order.ASC) -> "OrderBy":
        """Sort by originating source within a co-group at this position.

        Ref ``OrderBy.addSchemaOrder`` (P/tuplemr/OrderBy.java:168-194); the
        comparator tie-break on schemaId is SortComparator.java:250-256.
        """
        if isinstance(order, str):
            order = Order(order.lower())
        if self.source_order is not None:
            raise ValueError("source order already set")
        self.source_order = order
        self.source_order_index = len(self.elements)
        return self

    @staticmethod
    def parse(spec: str) -> "OrderBy":
        """Parse ``"a:asc,b:desc|null_biggest,source:asc"``.

        Grammar from ``P/tuplemr/OrderBy.java:49-92``; the pseudo-field
        ``source`` (or ``schema``) maps to ``add_source_order``.
        """
        ob = OrderBy()
        for raw in spec.split(","):
            token = raw.strip()
            if not token:
                continue
            name, _, rest = token.partition(":")
            name = name.strip()
            order_str, _, null_str = rest.partition("|")
            order = Order(order_str.strip().lower()) if order_str.strip() else Order.ASC
            if name.lower() in ("source", "schema"):
                ob.add_source_order(order)
                continue
            null_order = (
                NullOrder(null_str.strip().lower()) if null_str.strip() else NullOrder.NULL_SMALLEST
            )
            ob.add(name, order, null_order)
        if not ob.elements and ob.source_order is None:
            raise ValueError(f"no sort criteria parsed from {spec!r}")
        return ob

    @property
    def field_names(self) -> list[str]:
        return [e.name for e in self.elements]

    def columns(self, resolve=None) -> list[Column]:
        """Sort Column expressions, with the source-order column spliced in
        at its declared position when set."""
        cols = [e.to_column(resolve) for e in self.elements]
        if self.source_order is not None:
            src = F.col(SOURCE_ORDER_FIELD)
            src_col = src.asc() if self.source_order is Order.ASC else src.desc()
            cols.insert(self.source_order_index or 0, src_col)
        return cols

    def prefix(self, n: int) -> "OrderBy":
        return OrderBy(self.elements[:n])

    def starts_with(self, names: list[str]) -> bool:
        """Group-by must be a prefix of order-by
        (ref ``P/tuplemr/TupleMRConfigBuilder.java:282-288``)."""
        if len(names) > len(self.elements):
            return False
        return [e.name for e in self.elements[: len(names)]] == list(names)

    def __repr__(self) -> str:
        parts = [f"{e.name}:{e.order.value}|{e.null_order.value}" for e in self.elements]
        if self.source_order is not None:
            parts.insert(self.source_order_index or 0, f"source:{self.source_order.value}")
        return f"OrderBy({','.join(parts)!r})"
