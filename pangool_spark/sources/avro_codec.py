"""Pure-Python Avro Object Container File codec (Avro 1.x spec).

Implements the publicly documented binary format (magic ``Obj\\x01``, file
metadata map with ``avro.schema``/``avro.codec``, deflate or null codec,
sync-marker-delimited blocks; zigzag-varint longs, length-prefixed
bytes/strings, block-encoded arrays/maps, index-prefixed unions).

This backs ``sources/avro.py`` when neither the spark-avro jar nor a Python
avro library is available (reference treats Avro as first-class:
``P/tuplemr/avro/AvroInputFormat.java:45`` / ``AvroOutputFormat.java:52``).
It is the portability path, not the speed path: at cluster scale, ship
spark-avro and the same ``read_avro``/``write_avro`` API delegates to it.

Type mapping (both directions):

==============  =========================
Avro            Spark
==============  =========================
boolean         BooleanType
int             IntegerType
int/date        DateType
long            LongType
long/ts-micros  TimestampType
float/double    Float/DoubleType
string/enum     StringType
bytes/fixed     BinaryType
record          StructType
array<T>        ArrayType
map<V>          MapType(string, V)
union[null,T]   nullable T
==============  =========================
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, BinaryIO, Callable, Iterable, Iterator

from pyspark.sql import types as T

MAGIC = b"Obj\x01"
SYNC_SIZE = 16


class AvroCodecError(ValueError):
    pass


# ---------------------------------------------------------------------------
# primitive binary encoding (Avro spec "Binary encoding")

def _write_long(out: io.BytesIO, n: int) -> None:
    # zigzag (Python's arithmetic >> makes this sign-correct) then base-128
    # varint, little-endian groups of 7 bits
    n = ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _read_long(buf: BinaryIO) -> int:
    shift, acc = 0, 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise AvroCodecError("unexpected EOF in varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _read_bytes(buf: BinaryIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise AvroCodecError("unexpected EOF in bytes")
    return data


# ---------------------------------------------------------------------------
# schema compilation: avro schema (parsed JSON) -> (spark_type, encode, decode)

_PRIMITIVES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    "null": T.NullType(),
}


class _Compiled:
    __slots__ = ("spark_type", "encode", "decode", "nullable")

    def __init__(self, spark_type, encode, decode, nullable=False):
        self.spark_type = spark_type
        self.encode = encode
        self.decode = decode
        self.nullable = nullable


def _compile(schema: Any, named: dict[str, "_Compiled"] | None = None) -> _Compiled:
    """Build encoder/decoder closures for one avro schema node."""
    named = named if named is not None else {}
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return _compile({"type": schema}, named)
        if schema in named:
            return named[schema]
        raise AvroCodecError(f"unknown avro type {schema!r}")
    if isinstance(schema, list):
        return _compile_union(schema, named)

    t = schema["type"]
    if isinstance(t, (dict, list)):  # {"type": {...nested...}}
        return _compile(t, named)
    logical = schema.get("logicalType")

    if t == "null":
        return _Compiled(T.NullType(), lambda o, v: None, lambda b: None, True)
    if t == "boolean":
        return _Compiled(
            T.BooleanType(),
            lambda o, v: o.write(b"\x01" if v else b"\x00"),
            lambda b: b.read(1) == b"\x01",
        )
    if t == "int":
        if logical == "date":
            # (numpy scalar note: every integer path below coerces with
            # int(...) so np.int64 inputs can't wrap under numpy shift
            # semantics inside the zigzag)
            import datetime

            epoch = datetime.date(1970, 1, 1)
            return _Compiled(
                T.DateType(),
                lambda o, v: _write_long(o, (v - epoch).days),
                lambda b: epoch + __import__("datetime").timedelta(days=_read_long(b)),
            )
        if logical == "time-millis":
            # Spark-side representation: raw int millis-since-midnight.
            # (TimeType exists in Spark 4 but its Arrow round-trip through
            # the pandas decode path is not yet stable; the VALUE is
            # preserved exactly — ref AvroFieldSerialization.java:40-76
            # likewise defers logical interpretation to the consumer.)
            return _Compiled(
                T.IntegerType(), lambda o, v: _write_long(o, int(v)), _read_long
            )
        return _Compiled(T.IntegerType(), lambda o, v: _write_long(o, int(v)), _read_long)
    if t == "long":
        if logical == "timestamp-millis":
            import datetime

            epoch = datetime.datetime(1970, 1, 1)

            def enc_ts_ms(o, v):
                if isinstance(v, datetime.datetime):
                    v = int((v - epoch).total_seconds() * 1_000)
                _write_long(o, int(v))

            return _Compiled(
                T.TimestampType(),
                enc_ts_ms,
                lambda b: epoch
                + __import__("datetime").timedelta(milliseconds=_read_long(b)),
            )
        if logical == "time-micros":
            return _Compiled(
                T.LongType(), lambda o, v: _write_long(o, int(v)), _read_long
            )
        if logical == "timestamp-micros":
            import datetime

            epoch = datetime.datetime(1970, 1, 1)

            def enc_ts(o, v):
                if isinstance(v, datetime.datetime):
                    v = int((v - epoch).total_seconds() * 1_000_000)
                _write_long(o, int(v))

            return _Compiled(
                T.TimestampType(),
                enc_ts,
                lambda b: epoch + __import__("datetime").timedelta(microseconds=_read_long(b)),
            )
        return _Compiled(T.LongType(), lambda o, v: _write_long(o, int(v)), _read_long)
    if t == "float":
        return _Compiled(
            T.FloatType(),
            lambda o, v: o.write(struct.pack("<f", float(v))),
            lambda b: struct.unpack("<f", b.read(4))[0],
        )
    if t == "double":
        return _Compiled(
            T.DoubleType(),
            lambda o, v: o.write(struct.pack("<d", float(v))),
            lambda b: struct.unpack("<d", b.read(8))[0],
        )
    if t == "bytes":
        if logical == "decimal":
            return _compile_decimal(schema, fixed_size=None)
        return _Compiled(T.BinaryType(), lambda o, v: _write_bytes(o, bytes(v)), _read_bytes)
    if t == "string":
        # logicalType "uuid" rides the plain string encoding (the spec's
        # uuid is an annotation over string) — value passes through intact.
        return _Compiled(
            T.StringType(),
            lambda o, v: _write_bytes(o, str(v).encode("utf-8")),
            lambda b: _read_bytes(b).decode("utf-8"),
        )
    if t == "fixed":
        size = schema["size"]
        if logical == "decimal":
            c = _compile_decimal(schema, fixed_size=size)
        else:
            c = _Compiled(
                T.BinaryType(), lambda o, v: o.write(bytes(v)), lambda b: b.read(size)
            )
        named[schema["name"]] = c
        return c
    if t == "enum":
        symbols = list(schema["symbols"])
        index = {s: i for i, s in enumerate(symbols)}
        c = _Compiled(
            T.StringType(),
            lambda o, v: _write_long(o, index[v]),
            lambda b: symbols[_read_long(b)],
        )
        named[schema["name"]] = c
        return c
    if t == "array":
        item = _compile(schema["items"], named)

        def enc_arr(o, v):
            seq = list(v)
            if seq:
                _write_long(o, len(seq))
                for x in seq:
                    item.encode(o, x)
            _write_long(o, 0)

        def dec_arr(b):
            out = []
            while True:
                n = _read_long(b)
                if n == 0:
                    return out
                if n < 0:  # block with byte size prefix
                    n = -n
                    _read_long(b)
                for _ in range(n):
                    out.append(item.decode(b))

        return _Compiled(T.ArrayType(item.spark_type, item.nullable), enc_arr, dec_arr)
    if t == "map":
        val = _compile(schema["values"], named)

        def enc_map(o, v):
            items = dict(v)
            if items:
                _write_long(o, len(items))
                for k, x in items.items():
                    _write_bytes(o, k.encode("utf-8"))
                    val.encode(o, x)
            _write_long(o, 0)

        def dec_map(b):
            out = {}
            while True:
                n = _read_long(b)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_long(b)
                for _ in range(n):
                    k = _read_bytes(b).decode("utf-8")
                    out[k] = val.decode(b)

        return _Compiled(
            T.MapType(T.StringType(), val.spark_type, val.nullable), enc_map, dec_map
        )
    if t == "record":
        fields = [(f["name"], _compile(f["type"], named)) for f in schema["fields"]]

        def enc_rec(o, v):
            for fname, fc in fields:
                fc.encode(o, v.get(fname) if isinstance(v, dict) else getattr(v, fname))

        def dec_rec(b):
            return {fname: fc.decode(b) for fname, fc in fields}

        c = _Compiled(
            T.StructType(
                [T.StructField(fn, fc.spark_type, fc.nullable) for fn, fc in fields]
            ),
            enc_rec,
            dec_rec,
        )
        named[schema["name"]] = c
        return c
    raise AvroCodecError(f"unsupported avro type {t!r}")


def _compile_decimal(schema: dict, fixed_size: int | None) -> _Compiled:
    """Avro decimal logical type: two's-complement big-endian unscaled int
    over ``bytes`` (minimal length) or ``fixed`` (sign-extended to size).
    Breadth anchor: the reference round-trips arbitrary Avro logical types
    through AvroFieldSerialization
    (P/tuplemr/serialization/AvroFieldSerialization.java:40-76)."""
    import decimal

    precision = int(schema.get("precision", 10))
    scale = int(schema.get("scale", 0))
    if precision < 1 or scale < 0 or scale > precision:
        raise AvroCodecError(
            f"invalid decimal(precision={precision}, scale={scale})"
        )
    q = decimal.Decimal(1).scaleb(-scale)

    def enc(o, v):
        unscaled = int(
            decimal.Decimal(v).quantize(q, rounding=decimal.ROUND_HALF_UP).scaleb(scale)
        )
        if fixed_size is None:
            length = max(1, (unscaled.bit_length() + 8) // 8)
            _write_bytes(o, unscaled.to_bytes(length, "big", signed=True))
        else:
            o.write(unscaled.to_bytes(fixed_size, "big", signed=True))

    def dec(b):
        raw = _read_bytes(b) if fixed_size is None else b.read(fixed_size)
        return decimal.Decimal(int.from_bytes(raw, "big", signed=True)).scaleb(-scale)

    return _Compiled(T.DecimalType(precision, scale), enc, dec)


def _compile_union(schemas: list, named: dict) -> _Compiled:
    branches = [_compile(s, named) for s in schemas]
    null_idx = next(
        (i for i, b in enumerate(branches) if isinstance(b.spark_type, T.NullType)), None
    )
    non_null = [i for i in range(len(branches)) if i != null_idx]
    if null_idx is None or len(non_null) != 1:
        raise AvroCodecError(
            "only unions of null with ONE type are supported (nullable columns); "
            f"got {len(branches)} branches"
        )
    val_idx = non_null[0]
    val = branches[val_idx]

    def enc(o, v):
        if v is None:
            _write_long(o, null_idx)
        else:
            _write_long(o, val_idx)
            val.encode(o, v)

    def dec(b):
        idx = _read_long(b)
        return None if idx == null_idx else val.decode(b)

    return _Compiled(val.spark_type, enc, dec, nullable=True)


# ---------------------------------------------------------------------------
# Spark schema -> avro schema JSON

def spark_to_avro_schema(struct: T.StructType, name: str = "record0") -> dict:
    def conv(dtype: T.DataType, nullable: bool, path: str) -> Any:
        if isinstance(dtype, T.BooleanType):
            a: Any = "boolean"
        elif isinstance(dtype, (T.IntegerType, T.ShortType, T.ByteType)):
            a = "int"
        elif isinstance(dtype, T.LongType):
            a = "long"
        elif isinstance(dtype, T.FloatType):
            a = "float"
        elif isinstance(dtype, T.DoubleType):
            a = "double"
        elif isinstance(dtype, T.StringType):
            a = "string"
        elif isinstance(dtype, T.BinaryType):
            a = "bytes"
        elif isinstance(dtype, T.DecimalType):
            a = {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": dtype.precision,
                "scale": dtype.scale,
            }
        elif isinstance(dtype, T.DateType):
            a = {"type": "int", "logicalType": "date"}
        elif isinstance(dtype, T.TimestampType):
            a = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(dtype, T.ArrayType):
            a = {
                "type": "array",
                "items": conv(dtype.elementType, dtype.containsNull, path + "_item"),
            }
        elif isinstance(dtype, T.MapType):
            if not isinstance(dtype.keyType, T.StringType):
                raise AvroCodecError("avro maps require string keys")
            a = {
                "type": "map",
                "values": conv(dtype.valueType, dtype.valueContainsNull, path + "_val"),
            }
        elif isinstance(dtype, T.StructType):
            a = {
                "type": "record",
                "name": path,
                "fields": [
                    {"name": f.name, "type": conv(f.dataType, f.nullable, path + "_" + f.name)}
                    for f in dtype.fields
                ],
            }
        else:
            raise AvroCodecError(f"no avro mapping for Spark type {dtype.simpleString()}")
        return ["null", a] if nullable else a

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": conv(f.dataType, f.nullable, name + "_" + f.name)}
            for f in struct.fields
        ],
    }


def avro_to_spark_schema(schema: dict) -> T.StructType:
    compiled = _compile(schema)
    if not isinstance(compiled.spark_type, T.StructType):
        raise AvroCodecError("top-level avro schema must be a record")
    return compiled.spark_type


# ---------------------------------------------------------------------------
# container file read/write

def write_container(
    path: str,
    records: Iterable[dict],
    avro_schema: dict,
    codec: str = "deflate",
    sync_interval: int = 16000,
) -> int:
    """Write one .avro object container file; returns the record count."""
    if codec not in ("null", "deflate"):
        raise AvroCodecError(f"unsupported codec {codec!r}")
    compiled = _compile(avro_schema)
    sync = os.urandom(SYNC_SIZE)
    n_total = 0
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = io.BytesIO()
        _write_long(meta, 2)
        _write_bytes(meta, b"avro.schema")
        _write_bytes(meta, json.dumps(avro_schema).encode("utf-8"))
        _write_bytes(meta, b"avro.codec")
        _write_bytes(meta, codec.encode())
        _write_long(meta, 0)
        f.write(meta.getvalue())
        f.write(sync)

        block = io.BytesIO()
        n_block = 0

        def flush():
            nonlocal n_block
            if not n_block:
                return
            payload = block.getvalue()
            if codec == "deflate":
                payload = zlib.compress(payload)[2:-4]  # raw RFC-1951 stream
            head = io.BytesIO()
            _write_long(head, n_block)
            _write_long(head, len(payload))
            f.write(head.getvalue())
            f.write(payload)
            f.write(sync)
            block.seek(0)
            block.truncate()
            n_block = 0

        for rec in records:
            compiled.encode(block, rec)
            n_block += 1
            n_total += 1
            if block.tell() >= sync_interval:
                flush()
        flush()
    return n_total


def read_container_schema(path: str) -> dict:
    with open(path, "rb") as f:
        meta, _, _ = _read_header(f)
    return json.loads(meta[b"avro.schema"].decode("utf-8"))


def _read_header(f: BinaryIO):
    if f.read(4) != MAGIC:
        raise AvroCodecError("not an avro object container file")
    meta: dict[bytes, bytes] = {}
    while True:
        n = _read_long(f)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(f)
        for _ in range(n):
            k = _read_bytes(f)
            meta[k] = _read_bytes(f)
    sync = f.read(SYNC_SIZE)
    return meta, sync, f.tell()


def read_container(path: str) -> Iterator[dict]:
    """Yield records (as dicts) from one .avro container file."""
    yield from read_container_split(path, 0, None)


def _find_sync(f: BinaryIO, sync: bytes, start: int) -> int | None:
    """Scan forward from ``start`` for the sync marker; return the offset
    just PAST it (= the next block's start), or None. Chunked overlapping
    scan, Avro's own DataFileReader.sync() strategy (the 2^-128 chance of
    the pattern inside a payload is accepted)."""
    f.seek(start)
    chunk_size = 1 << 20
    offset = start
    prev_tail = b""
    while True:
        chunk = f.read(chunk_size)
        if not chunk:
            return None
        buf = prev_tail + chunk
        idx = buf.find(sync)
        if idx != -1:
            return offset - len(prev_tail) + idx + SYNC_SIZE
        prev_tail = buf[-(SYNC_SIZE - 1):]
        offset += len(chunk)


def read_container_split(path: str, start: int, end: int | None) -> Iterator[dict]:
    """Yield records from blocks whose start offset lies in [start, end).

    The splittability contract of the container format: blocks are framed
    by sync markers, so a reader assigned an arbitrary byte range syncs to
    the first block boundary at/after ``start`` and stops once a block
    begins at/after ``end`` — each block is decoded by exactly one split
    (ref AvroInputFormat's FileSplit handling, P/tuplemr/avro/
    AvroInputFormat.java:45)."""
    with open(path, "rb") as f:
        meta, sync, data_start = _read_header(f)
        schema = json.loads(meta[b"avro.schema"].decode("utf-8"))
        codec = meta.get(b"avro.codec", b"null").decode()
        if codec not in ("null", "deflate"):
            raise AvroCodecError(f"unsupported codec {codec!r}")
        compiled = _compile(schema)
        if start <= data_start:
            pos = data_start
        else:
            # a sync at offset p frames a block starting at p+16; scanning
            # from start-16 finds exactly the first block boundary >= start
            pos = _find_sync(f, sync, start - SYNC_SIZE)
            if pos is None:
                return
        f.seek(pos)
        while end is None or pos < end:
            first = f.read(1)
            if not first:
                return
            f.seek(-1, 1)
            n = _read_long(f)
            size = _read_long(f)
            payload = f.read(size)
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            block = io.BytesIO(payload)
            for _ in range(n):
                yield compiled.decode(block)
            if f.read(SYNC_SIZE) != sync:
                raise AvroCodecError("sync marker mismatch (corrupt block)")
            pos = f.tell()
