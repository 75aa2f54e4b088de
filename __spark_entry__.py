"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full catalog from ``pangool_spark.queries`` —
one entry per implemented operator from SURVEY.md §2 plus the extension
layers (dedup, similarity search, text analysis, multimodal plumbing,
streaming shapes verified on their batch path).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make pangool_spark importable regardless of the driver's cwd.
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)
_prev = os.environ.get("PYTHONPATH")
if _HERE not in (_prev or "").split(os.pathsep):
    os.environ["PYTHONPATH"] = _HERE + ((os.pathsep + _prev) if _prev else "")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pangool_spark.session import apply_runtime_confs
    from pangool_spark.queries import flagship

    apply_runtime_confs(spark)
    return flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    from pangool_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; keys without an oracle are the
    genuinely non-SQL-expressible ops (hash families / Arrow UDF pipelines)
    and get the driver's rows-only check."""
    from pangool_spark.queries import ORACLES

    return dict(ORACLES)
