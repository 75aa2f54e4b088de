"""Scalar function surface.

The reference has NO engine-level scalar functions — examples use plain Java
(SURVEY §2.3: StringTokenizer, Joda-Time). The port's contract is therefore
"expose Spark's built-ins directly": ``from pangool_spark import functions as F``
is a drop-in for ``pyspark.sql.functions``, plus a few engine extras.
"""

from pyspark.sql.functions import *  # noqa: F401,F403 — deliberate re-export
from pyspark.sql import functions as _F
from pyspark.sql import Column


def decimal_sum(col, precision: int = 18, scale: int = 4) -> Column:
    """Exact (order-independent) sum of a floating column via decimal cast.

    Double sums depend on reduction order — nondeterministic under shuffle.
    Aggregating as decimal makes results bit-stable across partitionings and
    engines; cast back to double at the boundary if needed.
    """
    c = _F.col(col) if isinstance(col, str) else col
    return _F.sum(c.cast(f"decimal({precision},{scale})"))


def decimal_avg(col, precision: int = 18, scale: int = 4) -> Column:
    """Order-independent average: exact decimal sum / count, as double."""
    c = _F.col(col) if isinstance(col, str) else col
    return (
        _F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")
        / _F.count(_F.when(c.isNotNull(), 1))
    )
