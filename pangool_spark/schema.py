"""Schema system: a thin, named, nullable-aware veneer over ``StructType``.

Reference semantics being reproduced (cites relative to /root/reference/):

- ``Schema`` = name + ordered Field list, duplicate names rejected
  (``P/io/Schema.java:655-680``).
- Type set INT/LONG/FLOAT/DOUBLE/STRING/BOOLEAN/ENUM/BYTES/OBJECT
  (``P/io/Schema.java:97-99``) → Spark types; ENUM becomes a checked string
  domain (no Spark enum), OBJECT becomes BinaryType or a nested struct.
- Nullability opt-in per field (``P/io/Schema.java:145,178-199``).
- Per-field default values for schema evolution
  (``P/io/Schema.java:106,362-409``) applied when a target schema has fields
  the read schema lacks (``P/tuplemr/serialization/SimpleTupleDeserializer.java:170-173``).
- Text DSL ``Fields.parse("name:string,age:int?,weight:float")`` with ``?``
  nullable suffix (``P/io/Fields.java:41-109``).
- JSON round-trip for shipping schemas (``P/io/Schema.java:736-772``).
- Field aliases so differently-named columns across sources can be grouped
  as one (``P/tuplemr/Aliases.java:33``, ``P/io/Schema.java:818-844``).

Everything compiles to plain Spark ``StructType``; extras Spark lacks (enum
domains, defaults, aliases) ride in a sidecar kept by this class and are
enforced/applied at the DataFrame boundary (``conform``/``check_enums``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Any, Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Pangool type name -> Spark type. date/timestamp/decimal/array/map are
# deliberate extensions: the reference stores dates as STRING
# (EX/movingaverage/MovingAverage.java:92) but a modern engine should not.
_TYPE_MAP: dict[str, T.DataType] = {
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "utf8": T.StringType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "bytes": T.BinaryType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
}

_REVERSE_TYPE_MAP: dict[str, str] = {
    "IntegerType": "int",
    "LongType": "long",
    "FloatType": "float",
    "DoubleType": "double",
    "StringType": "string",
    "BooleanType": "boolean",
    "BinaryType": "bytes",
    "DateType": "date",
    "TimestampType": "timestamp",
}


class SchemaError(ValueError):
    """Invalid schema declaration (mirrors reference IllegalArgumentExceptions)."""


@dataclass(frozen=True)
class Field:
    """One typed, optionally-nullable field. Ref ``P/io/Schema.java:92-360``."""

    name: str
    dtype: T.DataType
    nullable: bool = False
    default: Any = None
    enum_domain: tuple[str, ...] | None = None
    aliases: tuple[str, ...] = ()
    metadata: Mapping[str, Any] = dc_field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.name:
            raise SchemaError("field name must be non-empty")
        if self.enum_domain is not None and not isinstance(self.dtype, T.StringType):
            raise SchemaError(f"enum field {self.name!r} must be string-typed")

    @property
    def is_enum(self) -> bool:
        return self.enum_domain is not None

    def to_struct_field(self) -> T.StructField:
        meta = dict(self.metadata)
        if self.enum_domain is not None:
            meta["enum_domain"] = list(self.enum_domain)
        if self.default is not None:
            meta["default"] = self.default
        if self.aliases:
            meta["aliases"] = list(self.aliases)
        return T.StructField(self.name, self.dtype, self.nullable, metadata=meta)

    @staticmethod
    def parse(spec: str) -> "Field":
        """Parse one ``name:type`` token; ``?`` suffix marks nullable.

        Ref ``P/io/Fields.java:41-109`` (same grammar, plus our extensions:
        ``enum(A|B|C)``, ``array<t>``, ``map<k,v>``, ``decimal(p,s)``).
        """
        if ":" not in spec:
            raise SchemaError(f"bad field spec {spec!r}: expected name:type")
        name, _, type_str = spec.partition(":")
        name, type_str = name.strip(), type_str.strip()
        nullable = type_str.endswith("?")
        if nullable:
            type_str = type_str[:-1].strip()
        enum_domain: tuple[str, ...] | None = None
        metadata: dict[str, Any] = {}
        lowered = type_str.lower()
        if lowered.startswith("enum(") and type_str.endswith(")"):
            enum_domain = tuple(v.strip() for v in type_str[5:-1].split("|") if v.strip())
            dtype: T.DataType = T.StringType()
        elif lowered.startswith("object(") and type_str.endswith(")"):
            # OBJECT field with a named codec (ref pluggable serializations,
            # ThriftSerialization.java:43 / ProtoStuffSerialization.java:33):
            # stored as BinaryType, codec name kept in field metadata.
            codec_name = type_str[7:-1].strip()
            if not codec_name:
                raise SchemaError(f"object field {name!r} needs a codec name")
            metadata["codec"] = codec_name
            dtype = T.BinaryType()
        else:
            dtype = parse_type(type_str)
        return Field(
            name=name,
            dtype=dtype,
            nullable=nullable,
            enum_domain=enum_domain,
            metadata=metadata,
        )


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside <> or ()."""
    parts, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c in "<(":
            depth += 1
        elif c in ">)":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def parse_type(type_str: str) -> T.DataType:
    """Resolve a type name to a Spark DataType (supports nested DDL types).

    Structural types are parsed locally (JVM-free — usable before any
    SparkSession exists); Spark's own DDL parser is the fallback for
    anything more exotic."""
    import re

    s = type_str.strip()
    lowered = s.lower()
    if lowered in _TYPE_MAP:
        return _TYPE_MAP[lowered]
    m = re.fullmatch(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", lowered)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    if lowered == "decimal":
        return T.DecimalType(10, 0)
    if lowered.startswith("array<") and s.endswith(">"):
        return T.ArrayType(parse_type(s[6:-1]))
    if lowered.startswith("map<") and s.endswith(">"):
        parts = _split_top_level(s[4:-1])
        if len(parts) == 2:
            return T.MapType(parse_type(parts[0]), parse_type(parts[1]))
    if lowered.startswith("struct<") and s.endswith(">"):
        fields = []
        for part in _split_top_level(s[7:-1]):
            fname, sep, ftype = part.partition(":")
            if not sep:
                break
            fields.append(T.StructField(fname.strip(), parse_type(ftype)))
        else:
            return T.StructType(fields)
    try:
        return T._parse_datatype_string(type_str)
    except Exception as exc:
        raise SchemaError(f"unknown type {type_str!r}") from exc


class Schema:
    """Named, ordered field list. Ref ``P/io/Schema.java:638-680``."""

    def __init__(self, name: str, fields: Sequence[Field]):
        if not name:
            raise SchemaError("schema name must be non-empty")
        names = [f.name for f in fields]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            raise SchemaError(f"duplicate field names {sorted(dupes)} in schema {name!r}")
        if not fields:
            raise SchemaError(f"schema {name!r} must have at least one field")
        self.name = name
        self.fields: tuple[Field, ...] = tuple(fields)
        self._index = {f.name: i for i, f in enumerate(self.fields)}
        # Alias map: alias -> canonical name (P/tuplemr/Aliases.java:33).
        self._alias_to_name: dict[str, str] = {}
        for f in self.fields:
            for a in f.aliases:
                if a in self._index or a in self._alias_to_name:
                    raise SchemaError(f"alias {a!r} collides in schema {name!r}")
                self._alias_to_name[a] = f.name

    # -- construction ------------------------------------------------------
    @staticmethod
    def parse(name: str, spec: str) -> "Schema":
        """``Schema.parse("user", "name:string,age:int?")``."""
        return Schema(name, Fields.parse(spec))

    @staticmethod
    def from_struct(name: str, struct: T.StructType) -> "Schema":
        fields = []
        for sf in struct.fields:
            meta = dict(sf.metadata or {})
            fields.append(
                Field(
                    name=sf.name,
                    dtype=sf.dataType,
                    nullable=sf.nullable,
                    default=meta.get("default"),
                    enum_domain=tuple(meta["enum_domain"]) if "enum_domain" in meta else None,
                    aliases=tuple(meta.get("aliases", ())),
                )
            )
        return Schema(name, fields)

    # -- accessors ---------------------------------------------------------
    def __len__(self) -> int:
        return len(self.fields)

    def __iter__(self):
        return iter(self.fields)

    def __contains__(self, name: str) -> bool:
        return name in self._index

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Schema):
            return NotImplemented
        return self.name == other.name and self.fields == other.fields

    def __hash__(self) -> int:
        return hash((self.name, self.fields))

    def __repr__(self) -> str:
        cols = ",".join(f"{f.name}:{type_name(f.dtype)}{'?' if f.nullable else ''}" for f in self.fields)
        return f"Schema({self.name!r}, {cols!r})"

    def field(self, name: str) -> Field:
        return self.fields[self.index_of(name)]

    def index_of(self, name: str) -> int:
        if name in self._index:
            return self._index[name]
        if name in self._alias_to_name:
            return self._index[self._alias_to_name[name]]
        raise SchemaError(f"no field {name!r} in schema {self.name!r}")

    def resolve(self, name: str) -> str:
        """Canonical field name for ``name`` (may be an alias)."""
        return self.fields[self.index_of(name)].name

    @property
    def field_names(self) -> list[str]:
        return [f.name for f in self.fields]

    # -- conversion --------------------------------------------------------
    def to_struct(self) -> T.StructType:
        return T.StructType([f.to_struct_field() for f in self.fields])

    def to_ddl(self) -> str:
        return ", ".join(f"{f.name} {f.dtype.simpleString().upper()}" for f in self.fields)

    def to_json(self) -> str:
        """JSON ser for shipping schemas. Ref ``P/io/Schema.java:736-772``."""
        return json.dumps(
            {
                "name": self.name,
                "fields": [
                    {
                        "name": f.name,
                        "type": f.dtype.json(),
                        "nullable": f.nullable,
                        "default": f.default,
                        "enum_domain": list(f.enum_domain) if f.enum_domain else None,
                        "aliases": list(f.aliases),
                        "metadata": dict(f.metadata) if f.metadata else None,
                    }
                    for f in self.fields
                ],
            }
        )

    @staticmethod
    def from_json(payload: str) -> "Schema":
        data = json.loads(payload)
        fields = [
            Field(
                name=fd["name"],
                dtype=T._parse_datatype_json_string(fd["type"]),
                nullable=fd["nullable"],
                default=fd.get("default"),
                enum_domain=tuple(fd["enum_domain"]) if fd.get("enum_domain") else None,
                aliases=tuple(fd.get("aliases", ())),
                metadata=fd.get("metadata") or {},
            )
            for fd in data["fields"]
        ]
        return Schema(data["name"], fields)

    # -- schema algebra (ref P/io/Mutator.java:24-122) ---------------------
    def minus_fields(self, *names: str) -> "Schema":
        drop = {self.resolve(n) for n in names}
        return Schema(self.name, [f for f in self.fields if f.name not in drop])

    def subset_of(self, name: str, *names: str) -> "Schema":
        return Schema(name, [self.field(n) for n in names])

    def joint(self, other: "Schema", name: str | None = None) -> "Schema":
        """Union of fields, left-biased on duplicates. Ref ``Mutator.jointSchema``."""
        fields = list(self.fields)
        have = set(self.field_names)
        for f in other.fields:
            if f.name not in have:
                fields.append(f)
        return Schema(name or f"{self.name}_{other.name}", fields)

    # -- DataFrame boundary ------------------------------------------------
    def conform(self, df: DataFrame) -> DataFrame:
        """Project/cast/default a DataFrame to this schema.

        Reproduces read-schema vs target-schema evolution
        (``SimpleTupleDeserializer.java:87-110,146-173``): source columns are
        matched by name or alias, missing fields take their declared default
        (null if nullable), extra source columns are dropped, types are cast.
        """
        src_cols = set(df.columns)
        out: list[Column] = []
        for f in self.fields:
            source = None
            if f.name in src_cols:
                source = f.name
            else:
                for a in f.aliases:
                    if a in src_cols:
                        source = a
                        break
            if source is not None:
                codec_name = (f.metadata or {}).get("codec")
                if (
                    codec_name
                    and isinstance(f.dtype, T.BinaryType)
                    and not isinstance(df.schema[source].dataType, T.BinaryType)
                ):
                    # object(<codec>) field fed by non-binary input: encode
                    # at the boundary (the reference's serialization hook).
                    from pangool_spark.codecs import encode_col

                    src_type = df.schema[source].dataType
                    out.append(
                        encode_col(
                            source,
                            codec_name,
                            struct_input=isinstance(src_type, T.StructType),
                        ).alias(f.name)
                    )
                else:
                    out.append(F.col(source).cast(f.dtype).alias(f.name))
            elif f.default is not None:
                out.append(F.lit(f.default).cast(f.dtype).alias(f.name))
            elif f.nullable:
                out.append(F.lit(None).cast(f.dtype).alias(f.name))
            else:
                raise SchemaError(
                    f"source is missing non-nullable field {f.name!r} with no default"
                )
        return df.select(*out)

    def check_enums(self, df: DataFrame, strict: bool = True) -> DataFrame:
        """Enforce enum domains (ref ``P/io/Schema.java:330-360``).

        strict=True raises on out-of-domain values at the first action;
        strict=False nulls them (nullable) — done with built-in expressions,
        no Python in the row path.
        """
        for f in self.fields:
            if not f.is_enum:
                continue
            domain = F.array(*[F.lit(v) for v in f.enum_domain or ()])
            ok = F.col(f.name).isNull() | F.array_contains(domain, F.col(f.name))
            if strict:
                df = df.withColumn(
                    f.name,
                    F.when(ok, F.col(f.name)).otherwise(
                        F.raise_error(
                            F.concat(
                                F.lit(f"enum field {f.name}: out-of-domain value "),
                                F.col(f.name),
                            )
                        )
                    ),
                )
            else:
                df = df.withColumn(f.name, F.when(ok, F.col(f.name)))
        return df


class Fields:
    """Field-list helpers. Ref ``P/io/Fields.java``."""

    @staticmethod
    def parse(spec: str) -> list[Field]:
        """Parse ``"a:int,b:string?,c:enum(X|Y)?"`` → fields list.

        Ref ``P/io/Fields.java:41-109``. Commas inside ``(...)``/``<...>``
        (enum domains, nested DDL types) are respected.
        """
        tokens: list[str] = []
        depth = 0
        current: list[str] = []
        for ch in spec:
            if ch in "(<":
                depth += 1
            elif ch in ")>":
                depth -= 1
            if ch == "," and depth == 0:
                tokens.append("".join(current))
                current = []
            else:
                current.append(ch)
        if current:
            tokens.append("".join(current))
        fields = [Field.parse(tok) for tok in tokens if tok.strip()]
        if not fields:
            raise SchemaError(f"no fields parsed from {spec!r}")
        return fields


def type_name(dtype: T.DataType) -> str:
    return _REVERSE_TYPE_MAP.get(type(dtype).__name__, dtype.simpleString())


def with_aliases(f: Field, *aliases: str) -> Field:
    """Return a copy of ``f`` carrying extra accepted names."""
    return Field(
        name=f.name,
        dtype=f.dtype,
        nullable=f.nullable,
        default=f.default,
        enum_domain=f.enum_domain,
        aliases=tuple(f.aliases) + aliases,
        metadata=f.metadata,
    )


def tuple_field(name: str, schema: "Schema", nullable: bool = False) -> Field:
    """Tuple-in-tuple field: a nested Schema as one column.

    Ref ``Field.createTupleField`` + ``TupleFieldSerialization``
    (``P/io/Schema.java:241-256``, ``P/tuplemr/serialization/
    TupleFieldSerialization.java:35``) — here the nested tuple is a real
    nested ``StructType``, so Catalyst prunes/pushes into it instead of
    treating it as an opaque blob. Nested nullability is relaxed: Spark
    cannot CAST into nested NOT NULL fields, so inner-field nullability is
    advisory (enforce with check_enums-style validation if needed)."""
    inner = T.StructType(
        [
            T.StructField(sf.name, sf.dataType, True, sf.metadata)
            for sf in schema.to_struct().fields
        ]
    )
    return Field(
        name=name,
        dtype=inner,
        nullable=nullable,
        metadata={"tuple_schema": schema.name},
    )


def avro_field(name: str, avro_schema: dict, nullable: bool = False) -> Field:
    """Avro-typed field: the declared Avro schema mapped to its native Spark
    type (arrays/maps/records stay structural, never opaque bytes).

    Ref ``Fields.createAvroField`` + ``AvroFieldSerialization``
    (``P/io/Fields.java:114-135``, ``P/tuplemr/serialization/
    AvroFieldSerialization.java:40-76``; array column usage
    ``EX/avro/AvroTweetsJoin.java:132-144``)."""
    from pangool_spark.sources.avro_codec import _compile

    compiled = _compile(avro_schema)
    return Field(
        name=name,
        dtype=compiled.spark_type,
        nullable=nullable or compiled.nullable,
        metadata={"avro_schema": json.dumps(avro_schema)},
    )
