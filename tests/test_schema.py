"""Schema/Fields tests — mirrors reference TestSchema/TestMutator/
TestConfigParsing layers (SURVEY §5.1-5.2)."""

import pytest
from pyspark.sql import types as T

from pangool_spark.schema import Field, Fields, Schema, SchemaError


def test_fields_parse_basic():
    fields = Fields.parse("name:string,age:int?,weight:float")
    assert [f.name for f in fields] == ["name", "age", "weight"]
    assert fields[0].dtype == T.StringType() and not fields[0].nullable
    assert fields[1].dtype == T.IntegerType() and fields[1].nullable
    assert fields[2].dtype == T.FloatType()


def test_fields_parse_extended_types():
    fields = Fields.parse("tags:array<string>,score:double,when:timestamp,raw:bytes?")
    assert fields[0].dtype == T.ArrayType(T.StringType())
    assert fields[1].dtype == T.DoubleType()
    assert fields[2].dtype == T.TimestampType()
    assert fields[3].dtype == T.BinaryType() and fields[3].nullable


def test_enum_field():
    (f,) = Fields.parse("status:enum(OPEN|CLOSED)?")
    assert f.is_enum and f.enum_domain == ("OPEN", "CLOSED") and f.nullable
    assert f.dtype == T.StringType()


def test_schema_duplicate_field_rejected():
    with pytest.raises(SchemaError):
        Schema.parse("s", "a:int,a:string")


def test_schema_roundtrip_json():
    s = Schema.parse("user", "name:string,age:int?,status:enum(A|B)")
    s2 = Schema.from_json(s.to_json())
    assert s2 == s
    assert s2.field("status").enum_domain == ("A", "B")


def test_schema_to_struct_and_back():
    s = Schema.parse("user", "name:string,age:int?")
    struct = s.to_struct()
    assert struct == T.StructType(
        [
            T.StructField("name", T.StringType(), False),
            T.StructField("age", T.IntegerType(), True),
        ]
    )
    assert Schema.from_struct("user", struct) == s


def test_mutator_algebra():
    s = Schema.parse("s", "a:int,b:string,c:double?")
    assert s.minus_fields("b").field_names == ["a", "c"]
    assert s.subset_of("sub", "c", "a").field_names == ["c", "a"]
    other = Schema.parse("t", "c:double?,d:long")
    assert s.joint(other).field_names == ["a", "b", "c", "d"]


def test_conform_evolution(spark):
    # read-schema vs target-schema: missing field defaulted, extra dropped,
    # type cast (ref SimpleTupleDeserializer.java:87-110,170-173)
    df = spark.createDataFrame([(1, "x", 99)], "a INT, b STRING, zzz INT")
    target = Schema(
        "t",
        [
            Field("a", T.LongType()),
            Field("b", T.StringType()),
            Field("d", T.IntegerType(), nullable=True, default=7),
        ],
    )
    out = target.conform(df)
    assert out.columns == ["a", "b", "d"]
    row = out.collect()[0]
    assert row.a == 1 and row.b == "x" and row.d == 7
    assert dict(out.dtypes)["a"] == "bigint"


def test_conform_missing_non_nullable_raises(spark):
    df = spark.createDataFrame([(1,)], "a INT")
    target = Schema.parse("t", "a:int,b:string")
    with pytest.raises(SchemaError):
        target.conform(df)


def test_alias_resolution(spark):
    from pangool_spark.schema import with_aliases

    base = Fields.parse("url:string,ts:long")
    s = Schema("regs", [with_aliases(base[0], "nonCanonicalUrl"), base[1]])
    assert s.resolve("nonCanonicalUrl") == "url"
    df = spark.createDataFrame([("http://a", 1)], "nonCanonicalUrl STRING, ts LONG")
    out = s.conform(df)
    assert out.columns == ["url", "ts"]


def test_enum_check_nulls_out_of_domain(spark):
    s = Schema.parse("t", "k:int,status:enum(A|B)?")
    df = spark.createDataFrame([(1, "A"), (2, "Z")], "k INT, status STRING")
    out = s.check_enums(s.conform(df), strict=False)
    vals = {r.k: r.status for r in out.collect()}
    assert vals == {1: "A", 2: None}


def test_object_codec_roundtrip(spark):
    # Fake Thrift-style codec: encode a (tag, score) pair into length-prefixed
    # bytes. Mirrors the reference's pluggable per-field serializations
    # (ThriftSerialization.java:43, ProtoStuffSerialization.java:33).
    import struct

    from pangool_spark.codecs import decode_objects, register_codec, unregister_codec

    def enc(v):
        tag = v["tag"].encode()
        return struct.pack(">I", len(tag)) + tag + struct.pack(">d", v["score"])

    def dec(b):
        n = struct.unpack(">I", b[:4])[0]
        return {"tag": b[4 : 4 + n].decode(), "score": struct.unpack(">d", b[4 + n :])[0]}

    register_codec("fake_thrift", enc, dec, dtype="struct<tag:string,score:double>")
    try:
        s = Schema.parse("t", "k:int,payload:object(fake_thrift)?")
        # conform encodes the non-binary source column at the boundary
        src = spark.createDataFrame(
            [(1, ("a", 1.5)), (2, ("bb", -2.0)), (3, None)],
            "k INT, payload STRUCT<tag:STRING, score:DOUBLE>",
        )
        conformed = s.conform(src)
        assert dict(conformed.dtypes)["payload"] == "binary"
        # bytes survive a shuffle untouched; decode_objects restores typed values
        decoded = decode_objects(conformed.repartition(2, "k"), s)
        got = {r.k: (None if r.payload is None else (r.payload.tag, r.payload.score))
               for r in decoded.collect()}
        assert got == {1: ("a", 1.5), 2: ("bb", -2.0), 3: None}
    finally:
        unregister_codec("fake_thrift")


def test_catalog_roundtrip(tmp_path):
    from pangool_spark.catalog import Catalog

    cat = Catalog()
    cat.register(Schema.parse("users", "id:long,status:enum(A|B)?,payload:object(c1)?"))
    cat.register(Schema.parse("orders", "id:long,total:decimal(18,2)"))
    p = str(tmp_path / "catalog.json")
    cat.save(p)
    back = Catalog.load(p)
    assert back.names() == ["orders", "users"]
    users = back.get("users")
    assert users.field("status").enum_domain == ("A", "B")
    assert users.field("payload").metadata.get("codec") == "c1"
    assert back.get("orders").field("total").dtype.simpleString() == "decimal(18,2)"
    with pytest.raises(SchemaError):
        back.get("missing")
    with pytest.raises(SchemaError):
        back.register(Schema.parse("users", "x:int"))


def test_tuples_sidecar_carries_declared_schema(spark, tmp_path):
    from pangool_spark.catalog import read_tuples_catalogued, write_tuples_catalogued

    schema = Schema.parse("ev", "id:long,status:enum(OPEN|DONE)?")
    df = spark.createDataFrame([(1, "OPEN"), (2, None)], "id LONG, status STRING")
    path = str(tmp_path / "ds")
    write_tuples_catalogued(df, path, schema)
    back, declared = read_tuples_catalogued(spark, path)
    assert declared is not None and declared.field("status").enum_domain == ("OPEN", "DONE")
    assert {(r.id, r.status) for r in back.collect()} == {(1, "OPEN"), (2, None)}


def test_tuple_field_nested_struct(spark):
    # Tuple-in-tuple (Field.createTupleField): nested Schema = nested struct
    from pangool_spark.schema import tuple_field

    inner = Schema.parse("point", "x:double,y:double")
    outer = Schema("obs", [Field("id", T.LongType()), tuple_field("loc", inner, nullable=True)])
    df = spark.createDataFrame(
        [(1, (0.5, -1.5)), (2, None)], "id LONG, loc STRUCT<x:DOUBLE, y:DOUBLE>"
    )
    out = outer.conform(df)
    rows = {r.id: (None if r.loc is None else (r.loc.x, r.loc.y)) for r in out.collect()}
    assert rows == {1: (0.5, -1.5), 2: None}
    assert outer.field("loc").metadata["tuple_schema"] == "point"


def test_avro_field_maps_to_native_types():
    # Fields.createAvroField: avro array-of-string column -> ArrayType
    from pangool_spark.schema import avro_field

    f = avro_field("hashtags", {"type": "array", "items": "string"})
    # avro array of non-union strings cannot contain nulls
    assert f.dtype == T.ArrayType(T.StringType(), containsNull=False)
    f2 = avro_field("maybe_n", ["null", "long"])
    assert f2.dtype == T.LongType() and f2.nullable
