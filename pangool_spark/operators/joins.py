"""Join operators.

The reference's ONE physical join strategy is the reduce-side sort-merge
co-group (SURVEY §2.5): N intermediate schemas share a group-by key; the
reducer sees all tuples of a key across sources, ordered by source
(``addSchemaOrder``) then per-source criteria. Spark-first mapping:

- equi-joins that a reducer would hand-code → ``df.join`` and let Catalyst
  pick broadcast/SMJ/shuffle-hash (AQE re-plans at runtime);
- genuinely custom per-key merge logic → ``cogroup().applyInPandas`` (2
  sources) or tagged union + grouped apply (N sources, via ``JobBuilder``).
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pangool_spark.orderby import OrderBy
from pangool_spark.plans.job import _sort_pandas
from pangool_spark.schema import Schema


def broadcast_join(
    big: DataFrame, small: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Map-side join the reference lacks as a primitive (users loaded small
    files in ``setup()``, ref ``EX/naivebayes/NaiveBayesClassifier.java:49-72``).
    The broadcast hint guarantees no shuffle of the big side."""
    return big.join(F.broadcast(small), on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — expressible-but-absent in the reference (SURVEY §2.5)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — expressible-but-absent in the reference (SURVEY §2.5)."""
    return left.join(right, on, "left_anti")


def cogroup_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    fn: Callable[[tuple, pd.DataFrame, pd.DataFrame], pd.DataFrame],
    output_schema: Schema | T.StructType | str,
    left_order: OrderBy | str | None = None,
    right_order: OrderBy | str | None = None,
) -> DataFrame:
    """Two-source co-group with per-source sorted frames.

    Ref the UrlResolution pattern (``EX/urlresolution/UrlResolution.java:
    46-119``): group on a (possibly aliased) key, dimension rows first
    (schema order), fact rows sorted by their specific criteria. Here each
    side arrives as its own pandas frame — source order is structural — and
    per-source sorts replace ``setSpecificOrderBy``
    (``P/tuplemr/TupleMRConfigBuilder.java:296-343``).
    """
    if isinstance(output_schema, str):
        output_schema = Schema.parse("output", output_schema)
    struct = output_schema.to_struct() if isinstance(output_schema, Schema) else output_schema
    lob = OrderBy.parse(left_order) if isinstance(left_order, str) else left_order
    rob = OrderBy.parse(right_order) if isinstance(right_order, str) else right_order

    def run(key: tuple, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lob is not None:
            lpdf = _sort_pandas(lpdf, lob.elements)
        if rob is not None:
            rpdf = _sort_pandas(rpdf, rob.elements)
        return fn(key, lpdf, rpdf)

    return (
        left.groupBy(*[F.col(c) for c in on])
        .cogroup(right.groupBy(*[F.col(c) for c in on]))
        .applyInPandas(run, schema=struct)
    )
