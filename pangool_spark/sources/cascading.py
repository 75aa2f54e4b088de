"""Cascading tuple ingest — read Hadoop SequenceFiles whose values are
Cascading ``Tuple``s, the reference's foreign-format bridge
(``CascadingTupleInputFormat``, ``core/src/main/java/com/datasalt/
pangool/tuplemr/mapred/lib/input/CascadingTupleInputFormat.java:33-62``).

Reference semantics reproduced exactly:

- the SequenceFile KEY is ignored (the reference reads only
  ``getCurrentValue()``);
- the schema is lazily discovered from the first seen tuple's element
  types, with the caller supplying column names (Cascading doesn't
  persist them anywhere);
- the type correspondence is Integer→INT, Long→LONG, Float→FLOAT,
  Double→DOUBLE, String→STRING, Short→INT, Boolean→BOOLEAN, and any
  other element type is a loud error (the reference throws
  ``IOException``).

Spark-first shape: a driver-side PEEK of one file header + first record
discovers the schema (a few KB of I/O), then the decode fans out one
task per file over ``binaryFile`` rows — SequenceFiles are only
splittable at sync points, and Cascading sinks write many part files, so
per-file parallelism is the natural 100 TB unit. The decoder is pure
Python over in-memory bytes (no JVM round-trip, no Cascading jar) and
yields Arrow batches via ``mapInPandas``.

Wire format (public Hadoop + Cascading layouts):

- SequenceFile v6: ``SEQ\\x06`` magic, key/value class names
  (vint-length UTF-8), compression flags, metadata map, 16-byte sync
  marker; then records of ``[recordLen int32][keyLen int32][key][value]``
  with a ``-1`` escape announcing a repeated sync marker.
- Cascading ``TupleSerialization`` value bytes: Hadoop-vint element
  count, then per element a vint type token + payload — 0=null,
  1=String (vint byte-length + UTF-8), 2=Float (4B BE), 3=Double
  (8B BE), 4=Integer (vint), 5=Long (vlong), 6=Boolean (1B),
  7=Short (2B BE); tokens 8+ (nested Tuple/TuplePair/IndexTuple/
  registered writables) are the "only primitive Java types allowed"
  error class, same as the reference.
"""

from __future__ import annotations

import io
import os
import struct
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

_SEQ_MAGIC = b"SEQ"
_CASCADING_TUPLE = "cascading.tuple.Tuple"

# Cascading type token -> (spark type name, python reader)
_TOKEN_TYPES = {
    1: "string",
    2: "float",
    3: "double",
    4: "int",
    5: "bigint",
    6: "boolean",
    7: "int",  # Short widens to INT, same as the reference
}
_TOKEN_NAMES = {
    8: "cascading.tuple.Tuple",
    9: "cascading.tuple.TuplePair",
    10: "cascading.tuple.hadoop.util.IndexTuple",
}


def _read_vlong(buf: io.BytesIO) -> int:
    """Hadoop ``WritableUtils.readVLong``: single byte in [-112, 127] is
    the value; otherwise the first byte encodes sign and byte count."""
    first = buf.read(1)
    if not first:
        raise EOFError("vlong at EOF")
    b = struct.unpack("b", first)[0]
    if b >= -112:
        return b
    negative = b < -120
    length = -(b + 120) if negative else -(b + 112)
    data = buf.read(length)
    if len(data) != length:
        raise EOFError("truncated vlong")
    value = 0
    for byte in data:
        value = (value << 8) | byte
    return ~value if negative else value


def _read_string(buf: io.BytesIO) -> str:
    n = _read_vlong(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated string")
    return data.decode("utf-8")


def _decode_tuple(buf: io.BytesIO) -> tuple[list, list[int]]:
    """One Cascading tuple -> (values, type tokens); token 0 marks null
    (its slot contributes no type evidence)."""
    arity = _read_vlong(buf)
    values: list = []
    tokens: list[int] = []
    for _ in range(arity):
        token = _read_vlong(buf)
        tokens.append(token)
        if token == 0:
            values.append(None)
        elif token == 1:
            values.append(_read_string(buf))
        elif token == 2:
            values.append(struct.unpack(">f", buf.read(4))[0])
        elif token == 3:
            values.append(struct.unpack(">d", buf.read(8))[0])
        elif token in (4, 5):
            values.append(_read_vlong(buf))
        elif token == 6:
            values.append(buf.read(1) != b"\x00")
        elif token == 7:
            values.append(struct.unpack(">h", buf.read(2))[0])
        else:
            # same error class as the reference's IOException for
            # non-primitive element types
            name = _TOKEN_NAMES.get(token, f"token {token}")
            raise IOError(
                f"Can't handle type [{name}] - only primitive Java "
                "types allowed."
            )
    return values, tokens


def _iter_records(data: bytes, path: str) -> Iterator[bytes]:
    """Yield raw VALUE bytes of every record in one SequenceFile."""
    buf = io.BytesIO(data)
    magic = buf.read(3)
    if magic != _SEQ_MAGIC:
        raise IOError(f"{path}: not a SequenceFile (magic {magic!r})")
    version = buf.read(1)[0]
    if version < 6:
        raise IOError(
            f"{path}: SequenceFile version {version} unsupported (need 6)"
        )
    key_cls = _read_string(buf)
    val_cls = _read_string(buf)
    if val_cls != _CASCADING_TUPLE:
        raise IOError(
            f"{path}: value class {val_cls!r} is not {_CASCADING_TUPLE!r}"
        )
    compressed = buf.read(1) != b"\x00"
    block_compressed = buf.read(1) != b"\x00"
    if compressed or block_compressed:
        raise IOError(
            f"{path}: compressed SequenceFiles unsupported by this shim "
            "(Cascading Hfs sinks default to record-uncompressed)"
        )
    n_meta = struct.unpack(">i", buf.read(4))[0]
    for _ in range(n_meta):
        _read_string(buf)
        _read_string(buf)
    sync = buf.read(16)
    total = len(data)
    while buf.tell() < total:
        (rec_len,) = struct.unpack(">i", buf.read(4))
        if rec_len == -1:  # sync escape
            marker = buf.read(16)
            if marker != sync:
                raise IOError(f"{path}: bad sync marker at {buf.tell()}")
            continue
        (key_len,) = struct.unpack(">i", buf.read(4))
        buf.seek(key_len, os.SEEK_CUR)  # reference ignores the key
        value = buf.read(rec_len - key_len)
        if len(value) != rec_len - key_len:
            raise EOFError(f"{path}: truncated record at {buf.tell()}")
        yield value


def _discover_types(
    data: bytes, path: str, n_fields: int, scan_limit: int = 128
) -> list[str]:
    """Reference-style lazy discovery, hardened for nulls: the reference
    reads types off the FIRST tuple (and would fail on a null slot);
    here the first ``scan_limit`` records are scanned until every field
    has non-null type evidence."""
    types: list[str | None] = [None] * n_fields
    for i, value in enumerate(_iter_records(data, path)):
        values, tokens = _decode_tuple(io.BytesIO(value))
        if len(tokens) != n_fields:
            raise IOError(
                f"{path}: tuple arity {len(tokens)} != "
                f"{n_fields} field names"
            )
        for j, token in enumerate(tokens):
            if token != 0 and types[j] is None:
                types[j] = _TOKEN_TYPES[token]
        if all(t is not None for t in types) or i + 1 >= scan_limit:
            break
    unresolved = [j for j, t in enumerate(types) if t is None]
    if unresolved:
        raise IOError(
            f"{path}: fields {unresolved} are null in the first "
            f"{scan_limit} records — no type evidence to discover a "
            "schema from (pass data with non-null leading records)"
        )
    return [t for t in types if t is not None]


def read_cascading_tuples(
    spark: SparkSession,
    path: str,
    field_names: Sequence[str],
    schema_name: str = "cascading",
) -> DataFrame:
    """Read a Cascading SequenceFile sink into a DataFrame — the
    reference's ``new CascadingTupleInputFormat(schemaName, names...)``
    (``CascadingTupleInputFormat.java:60``). Column names come from the
    caller; types are discovered from the data; the SequenceFile key is
    ignored. ``schema_name`` is carried as DataFrame metadata parity
    only (Spark schemas are anonymous).
    """
    if not field_names:
        raise ValueError("field_names must be non-empty")
    names = list(field_names)

    files = spark.read.format("binaryFile").load(path)
    first = (
        files.select("path", "content").orderBy("path").limit(1).collect()
    )
    if not first:
        raise FileNotFoundError(f"no files under {path}")
    types = _discover_types(bytes(first[0]["content"]), first[0]["path"], len(names))
    ddl = ", ".join(f"`{n}` {t}" for n, t in zip(names, types))

    n_fields = len(names)

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for file_path, content in zip(pdf["path"], pdf["content"]):
                rows = []
                for value in _iter_records(bytes(content), file_path):
                    values, tokens = _decode_tuple(io.BytesIO(value))
                    if len(values) != n_fields:
                        raise IOError(
                            f"{file_path}: tuple arity {len(values)} != "
                            f"{n_fields} field names"
                        )
                    rows.append(values)
                if rows:
                    yield pd.DataFrame(rows, columns=names)

    return files.select("path", "content").mapInPandas(decode, schema=ddl)
