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


@pandas_udf("double")
def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Row-wise cosine similarity of two raw (unnormalized) array columns."""
    if not len(a):
        return pd.Series([], dtype="float64")
    ma = np.stack(a.to_numpy()).astype(np.float64)
    mb = np.stack(b.to_numpy()).astype(np.float64)
    dots = np.einsum("ij,ij->i", ma, mb)
    denom = np.maximum(np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1), 1e-12)
    return pd.Series(dots / denom)
