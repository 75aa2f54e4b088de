"""Property-based storage round-trip + evolution.

Mirrors the reference's randomized serialization tests
(core/.../serialization/TestTupleSerialization.java incl. the
default-value/evolution cases at :100): random schemas, random rows with
nulls → tuple-file write → read back (identity) and read through an evolved
target schema (field dropped + nullable field added with default).
"""

import os

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st

from pangool_spark.schema import Field, Schema
from pangool_spark.sources import read_tuples, write_tuples
from pyspark.sql import types as T

_TYPES = {
    "int": (T.IntegerType(), st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1))),
    "long": (T.LongType(), st.one_of(st.none(), st.integers(-(2**62), 2**62))),
    "double": (T.DoubleType(), st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=64))),
    "string": (T.StringType(), st.one_of(st.none(), st.text(max_size=12))),
    "boolean": (T.BooleanType(), st.one_of(st.none(), st.booleans())),
}


@st.composite
def tables(draw):
    n_cols = draw(st.integers(1, 4))
    kinds = draw(st.lists(st.sampled_from(list(_TYPES)), min_size=n_cols, max_size=n_cols))
    fields = [Field(f"c{i}", _TYPES[k][0], nullable=True) for i, k in enumerate(kinds)]
    n_rows = draw(st.integers(0, 6))
    rows = [tuple(draw(_TYPES[k][1]) for k in kinds) for _ in range(n_rows)]
    return Schema("t", fields), rows


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=tables())
def test_tuplefile_roundtrip_and_evolution(spark, tmp_path_factory, case):
    schema, rows = case
    path = str(tmp_path_factory.mktemp("prop")) + "/t"
    df = spark.createDataFrame(rows, schema.to_struct())
    write_tuples(df, path)

    def norm(seq):
        return sorted(
            seq, key=lambda t: tuple((v is None, repr(v)) for v in t)
        )

    # identity read
    back = read_tuples(spark, path)
    assert norm(map(tuple, back.collect())) == norm(rows)

    # evolution: drop the first field, add a defaulted long
    evolved = Schema(
        "t2",
        list(schema.fields[1:]) + [Field("added", T.LongType(), nullable=True, default=7)],
    )
    got = norm(map(tuple, read_tuples(spark, path, target_schema=evolved).collect()))
    expected = norm((*r[1:], 7) for r in rows)
    assert got == expected
