"""Job builders: the reference's builder API compiled to DataFrame plans.

- ``JobBuilder``  ≈ TupleMRBuilder + TupleMRConfigBuilder
  (``P/tuplemr/TupleMRBuilder.java``, ``P/tuplemr/TupleMRConfigBuilder.java``)
- ``MapOnlyJobBuilder`` ≈ shuffle-free pipelines
  (``P/tuplemr/MapOnlyJobBuilder.java:68-191``)
"""

from pangool_spark.plans.job import JobBuilder, RollupReducer, PlanError
from pangool_spark.plans.map_only import MapOnlyJobBuilder
from pangool_spark.plans.iterate import iterate
from pangool_spark.plans.cache import cached_result, plan_cache_key

__all__ = [
    "JobBuilder",
    "RollupReducer",
    "MapOnlyJobBuilder",
    "PlanError",
    "iterate",
    "cached_result",
    "plan_cache_key",
]
