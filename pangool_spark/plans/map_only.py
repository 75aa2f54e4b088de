"""Map-only (shuffle-free) pipelines.

Ref ``P/tuplemr/MapOnlyJobBuilder.java:68-191`` + ``MapOnlyMapper``
(``P/tuplemr/mapred/MapOnlyMapper.java:56-75``): N inputs, each with its own
mapper, one (or N named) outputs, no partitioner/comparators. Spark: a narrow
DataFrame pipeline — read → per-input transform → union → write. The plan
must contain no Exchange; ``explain`` shows only scans, projects, filters,
and the union.

Named outputs (ref ``PangoolMultipleOutputs``,
``P/tuplemr/mapred/lib/output/PangoolMultipleOutputs.java:48-70``) map to N
writes of one cached lineage; dynamic output names map to
``df.write.partitionBy(tag)``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from pangool_spark.plans.job import PlanError


class MapOnlyJobBuilder:
    def __init__(self, spark: SparkSession, name: str = "map_only_job"):
        self.spark = spark
        self.name = name
        self._parts: list[DataFrame] = []
        self._named_outputs: dict[str, Callable[[DataFrame], DataFrame]] = {}

    def add_input(
        self, df: DataFrame, mapper: Callable[[DataFrame], DataFrame] | None = None
    ) -> "MapOnlyJobBuilder":
        self._parts.append(mapper(df) if mapper is not None else df)
        return self

    def add_named_output(
        self, name: str, derive: Callable[[DataFrame], DataFrame]
    ) -> "MapOnlyJobBuilder":
        if name in self._named_outputs:
            raise PlanError(f"duplicate named output {name!r}")
        self._named_outputs[name] = derive
        return self

    def to_dataframe(self) -> DataFrame:
        if not self._parts:
            raise PlanError("no inputs declared")
        out = self._parts[0]
        for df in self._parts[1:]:
            out = out.unionByName(df, allowMissingColumns=True)
        return out

    def to_dataframes(self) -> dict[str, DataFrame]:
        """Main output under ``""`` plus each named output, derived from one
        cached lineage so the narrow work runs once."""
        main = self.to_dataframe()
        if self._named_outputs:
            main = main.cache()
        outputs = {"": main}
        for name, derive in self._named_outputs.items():
            outputs[name] = derive(main)
        return outputs
