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


def membership_overlap_udf(key_set: frozenset):
    """Factory: Arrow-batched counter of per-row array members present in
    ``key_set`` (closure-shipped to executors once per task, like any
    broadcast lookup). Factory lives here because pandas_udf needs REAL
    type hints — modules using ``from __future__ import annotations``
    stringify them."""

    @pandas_udf("int")
    def overlap_count(grams: pd.Series) -> pd.Series:
        return grams.apply(
            lambda g: len(frozenset(g) & key_set) if g is not None else 0
        ).astype("int32")

    return overlap_count


@pandas_udf("double")
def compression_ratio_udf(text: pd.Series) -> pd.Series:
    """zlib-deflate bytes-out/bytes-in per row (level 6). Arrow-batched;
    ratio > ~0.6 ≈ natural prose, << that ≈ repetitive boilerplate."""
    import zlib

    def ratio(t):
        if t is None:
            return None
        raw = t.encode("utf-8")
        if not raw:
            return 1.0
        return len(zlib.compress(raw, 6)) / len(raw)

    return text.apply(ratio).astype("float64")
