"""Arrow-vectorized UDFs. NOTE: no ``from __future__ import annotations``
here — pandas_udf resolves real type hints, not strings."""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def dot_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Row-wise dot product of two array columns, one einsum per Arrow batch."""
    if not len(a):
        return pd.Series([], dtype="float64")
    ma = np.stack(a.to_numpy())
    mb = np.stack(b.to_numpy())
    return pd.Series(np.einsum("ij,ij->i", ma, mb))
