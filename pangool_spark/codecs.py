"""Pluggable per-field OBJECT codecs.

Reference parity: Pangool lets individual OBJECT fields pick a custom
serialization — Thrift (``P/core/.../serialization/ThriftSerialization.java:43``),
Protostuff (``ProtoStuffSerialization.java:33``) — registered once and
applied transparently when tuples cross the serialization boundary.

Spark mapping: OBJECT fields live in DataFrames as ``BinaryType`` columns
(Tungsten-managed, shuffle-safe, format-agnostic); a codec is a named
``(encode, decode)`` pair applied only at the *Python boundary* — encoding
arbitrary objects into bytes when conforming non-binary input, and decoding
bytes back in reducers / mapInPandas where users actually touch values.
The JVM row path never sees Python: a binary column shuffles, joins and
groups like any other column. Codec functions are captured by closure into
the Arrow-batched UDFs at plan-build time, so executors need no registry
distribution (same role as the reference's InstancesDistributor).

The declared ``object(<codec>)`` schema type keeps the codec name in the
StructField metadata, so it survives tuple-file round-trips.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class Codec:
    def __init__(
        self,
        name: str,
        encode: Callable[[Any], bytes],
        decode: Callable[[bytes], Any],
        dtype: T.DataType | str | None = None,
    ):
        self.name = name
        self.encode = encode
        self.decode = decode
        # Optional DECODED Spark type: lets decode_col return a typed
        # column; codecs decoding to arbitrary Python objects omit it and
        # can only be decoded inside pandas-boundary code.
        if isinstance(dtype, str):
            from pangool_spark.schema import parse_type

            dtype = parse_type(dtype)
        self.dtype = dtype


_REGISTRY: dict[str, Codec] = {}


def register_codec(
    name: str,
    encode: Callable[[Any], bytes],
    decode: Callable[[bytes], Any],
    dtype: T.DataType | str | None = None,
) -> Codec:
    """Register (or replace) a named codec. ``encode(value) -> bytes``,
    ``decode(bytes) -> value``; ``dtype`` optionally declares the decoded
    Spark type so ``decode_col`` can build a typed column."""
    codec = Codec(name, encode, decode, dtype)
    _REGISTRY[name] = codec
    return codec


def get_codec(name: str) -> Codec:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown codec {name!r}; register it with register_codec(name, encode, decode)"
        ) from None


def unregister_codec(name: str) -> None:
    _REGISTRY.pop(name, None)


def encode_col(col: Column | str, codec_name: str, struct_input: bool = False) -> Column:
    """Arrow-batched encode: any column → binary via the codec. Keeps nulls.

    ``struct_input=True`` for struct-typed sources: Arrow hands structs to
    pandas UDFs as a DataFrame whose null rows are indistinguishable from
    all-null fields, so the null flag travels as an explicit second input.
    """
    from pyspark.sql.functions import pandas_udf

    codec = get_codec(codec_name)
    enc = codec.encode
    c = F.col(col) if isinstance(col, str) else col

    if struct_input:

        @pandas_udf(T.BinaryType())
        def _encode_struct(is_null: pd.Series, s: pd.DataFrame) -> pd.Series:
            records = s.to_dict("records")
            return pd.Series(
                [None if null else enc(rec) for null, rec in zip(is_null, records)],
                dtype=object,
            )

        return _encode_struct(c.isNull(), c)

    @pandas_udf(T.BinaryType())
    def _encode(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else enc(v))

    return _encode(c)


def decode_col(col: Column | str, codec_name: str, dtype: T.DataType | str | None = None) -> Column:
    """Arrow-batched decode: binary column → the codec's declared (or the
    given) Spark type. Raises if neither declares the decoded type."""
    from pyspark.sql.functions import pandas_udf

    codec = get_codec(codec_name)
    if isinstance(dtype, str):
        from pangool_spark.schema import parse_type

        dtype = parse_type(dtype)
    out_type = dtype or codec.dtype
    if out_type is None:
        raise ValueError(
            f"codec {codec_name!r} has no declared decode dtype; pass dtype= or "
            "decode inside a reducer/mapInPandas instead"
        )
    dec = codec.decode
    c = F.col(col) if isinstance(col, str) else col

    if isinstance(out_type, T.StructType):
        names = [f.name for f in out_type.fields]

        @pandas_udf(out_type)
        def _decode_struct(s: pd.Series) -> pd.DataFrame:
            records = [None if v is None else dec(bytes(v)) for v in s]
            return pd.DataFrame(
                {n: [None if r is None else r.get(n) for r in records] for n in names}
            )

        # a pandas DataFrame return can't express NULL struct rows (only
        # structs of nulls), so nullness is restored at the expression level
        return F.when(c.isNull(), F.lit(None).cast(out_type)).otherwise(_decode_struct(c))

    @pandas_udf(out_type)
    def _decode(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else dec(bytes(v)))

    return _decode(c)


def decode_objects(df: DataFrame, schema) -> DataFrame:
    """Decode every ``object(<codec>)`` field of ``schema`` that has a
    declared decode dtype; other columns pass through unchanged."""
    cols = []
    for f in schema.fields:
        codec_name = (f.metadata or {}).get("codec")
        if codec_name and get_codec(codec_name).dtype is not None:
            cols.append(decode_col(f.name, codec_name).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)
