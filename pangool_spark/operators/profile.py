"""Data-quality profiling: per-column stats in ONE pass over the table.

The pipeline-health primitive (Deequ / Great Expectations territory) the
reference never had — at 100 TB you profile before you process, and the
profile must not cost N scans for N columns.

Shape: one ``agg`` computes every column's count / nulls / exact distinct /
min / max simultaneously — Catalyst compiles the multiple exact
COUNT(DISTINCT) into a single Expand + two-level aggregate, so the table is
READ ONCE regardless of column count (the Expand multiplies rows ×|cols|
in-memory, the standard cost of simultaneous exact NDVs; swap in
``approx_count_distinct`` via ``exact=False`` when a 2% NDV error is
acceptable at scale — that keeps the plan Expand-free). The single result
row is then unpivoted driver-side-free via ``stack`` into one row per
column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame, cols: Sequence[str] | None = None, exact: bool = True
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_null, n_distinct, min, max).

    min/max are stringified so heterogeneous column types share one output
    schema; NDV is exact by default (``exact=False`` → HLL sketch, no
    Expand). Nulls are excluded from NDV/min/max, matching SQL semantics.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("column_profile needs at least one column")
    ndv = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__cnt_{c}__"),
            ndv(F.col(c)).alias(f"__ndv_{c}__"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}__"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}__"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n__ - __cnt_{c}__, __ndv_{c}__, __min_{c}__, __max_{c}__"
        for c in cols
    )
    return one.selectExpr(
        "__n__ AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS (column, n_null, n_distinct, min, max)",
    ).select("column", "n_rows", "n_null", "n_distinct", "min", "max")
