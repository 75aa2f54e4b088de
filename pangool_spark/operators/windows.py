"""Window-function operators.

The reference has no window operator — the *pattern* is sorted-group
iteration with carried state (SURVEY §2.7). All four library ops here compile
to native window functions (JVM-side, single shuffle on the partition key).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pangool_spark.orderby import OrderBy


def _order_cols(order_by: OrderBy | str | Sequence[Column]):
    if isinstance(order_by, str):
        order_by = OrderBy.parse(order_by)
    if isinstance(order_by, OrderBy):
        return order_by.columns()
    return list(order_by)


def top_k(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: OrderBy | str | Sequence[Column],
    k: int,
    rank_col: str | None = None,
    method: str = "row_number",
) -> DataFrame:
    """Top-k rows per group.

    Ref: heap-based top-N per (location,date) (``EX/topnhashtags/
    TopNHashTags.java:92-134``) and first-k of a sorted group
    (``EX/topicalwordcount/TopicFingerprint.java:64-79``). Compiled to
    ``row_number()/rank()/dense_rank() OVER (PARTITION BY ... ORDER BY ...)``
    — Spark pushes a per-partition heap (WindowGroupLimit) below the shuffle,
    exactly the reference's map-side heap trick but automatic.
    """
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
    ranked = df.withColumn("__rank__", fn().over(w)).filter(F.col("__rank__") <= k)
    if rank_col:
        return ranked.withColumnRenamed("__rank__", rank_col)
    return ranked.drop("__rank__")


def moving_average(
    df: DataFrame,
    partition_by: Sequence[str],
    order_col: str,
    value_col: str,
    window_size: int,
    out_col: str = "moving_avg",
    range_based: bool = True,
) -> DataFrame:
    """Trailing-window average per key.

    Ref ``EX/movingaverage/MovingAverage.java:51-137`` (queue of the last n
    days per url). ``range_based=True`` reproduces the reference exactly: the
    frame covers *values* within ``[current - (n-1), current]`` of a numeric
    order column (missing days shrink the window, as the reference's
    date-pruned queue does). ``range_based=False`` gives a row-count frame.
    """
    w = Window.partitionBy(*partition_by).orderBy(F.col(order_col))
    if range_based:
        w = w.rangeBetween(-(window_size - 1), 0)
    else:
        w = w.rowsBetween(-(window_size - 1), 0)
    return df.withColumn(out_col, F.avg(value_col).over(w))


def normalize_by_group_total(
    df: DataFrame,
    partition_by: Sequence[str],
    value_col: str,
    out_col: str = "ratio",
) -> DataFrame:
    """value / sum(value) over the partition.

    Ref ``EX/useractivitynormalizer/UserActivityNormalizer.java:46-153``,
    which needed a mapper double-emit + boolean sort trick + rollup to see
    the group total before the detail rows; a window total is one shuffle
    and no row duplication.
    """
    w = Window.partitionBy(*partition_by)
    return df.withColumn(out_col, F.col(value_col) / F.sum(value_col).over(w))


def lead_lag(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: OrderBy | str | Sequence[Column],
    col: str,
    offset: int = 1,
) -> DataFrame:
    """lead/lag — no reference counterpart (SURVEY §2.7), Spark superset."""
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
    return df.withColumn(f"{col}_lag", F.lag(col, offset).over(w)).withColumn(
        f"{col}_lead", F.lead(col, offset).over(w)
    )
