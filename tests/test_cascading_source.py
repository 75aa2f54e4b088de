"""Cascading SequenceFile ingest (`sources/cascading.py`) — the last
SURVEY §2 row (reference `CascadingTupleInputFormat.java:33-62`).

The writer here is an independent pure-Python implementation of the
public wire layout (Hadoop SequenceFile v6 + Cascading
TupleSerialization tokens), used to round-trip the reader. Because
writer and reader share an author, the low-level encodings are ALSO
pinned byte-for-byte against values hand-derived from the published
Hadoop `WritableUtils.writeVLong` algorithm, so a shared misreading of
the spec cannot self-validate. A generated fixture is committed at
tests/fixtures/cascading_orders.seq to freeze the layout across
refactors.
"""

from __future__ import annotations

import io
import os
import struct

import pytest

from pangool_spark.sources.cascading import (
    _decode_tuple,
    _iter_records,
    _read_vlong,
    read_cascading_tuples,
)

SYNC = bytes(range(16))


def write_vlong(out: io.BytesIO, i: int) -> None:
    """Hadoop WritableUtils.writeVLong, transcribed from the public
    algorithm (independent of the reader's decode loop)."""
    if -112 <= i <= 127:
        out.write(struct.pack("b", i))
        return
    length = -112
    if i < 0:
        i ^= -1
        length = -120
    tmp = i
    while tmp != 0:
        tmp >>= 8
        length -= 1
    out.write(struct.pack("b", length))
    length = -(length + 120) if length < -120 else -(length + 112)
    for idx in range(length, 0, -1):
        shift = (idx - 1) * 8
        out.write(bytes([(i >> shift) & 0xFF]))


def write_string(out: io.BytesIO, s: str) -> None:
    data = s.encode("utf-8")
    write_vlong(out, len(data))
    out.write(data)


def encode_tuple(values) -> bytes:
    """Cascading TupleSerialization element stream: vint arity then
    token+payload per element; None -> token 0."""
    out = io.BytesIO()
    write_vlong(out, len(values))
    for v in values:
        if v is None:
            write_vlong(out, 0)
        elif isinstance(v, str):
            write_vlong(out, 1)
            write_string(out, v)
        elif isinstance(v, bool):
            write_vlong(out, 6)
            out.write(b"\x01" if v else b"\x00")
        elif isinstance(v, float):
            write_vlong(out, 3)
            out.write(struct.pack(">d", v))
        elif isinstance(v, tuple) and v[0] == "int":
            write_vlong(out, 4)
            write_vlong(out, v[1])
        elif isinstance(v, tuple) and v[0] == "long":
            write_vlong(out, 5)
            write_vlong(out, v[1])
        elif isinstance(v, tuple) and v[0] == "short":
            write_vlong(out, 7)
            out.write(struct.pack(">h", v[1]))
        elif isinstance(v, tuple) and v[0] == "float32":
            write_vlong(out, 2)
            out.write(struct.pack(">f", v[1]))
        elif isinstance(v, tuple) and v[0] == "token":
            write_vlong(out, v[1])
        else:
            raise AssertionError(f"unsupported test value {v!r}")
    return out.getvalue()


def write_seqfile(path: str, tuples, sync_every: int = 3) -> None:
    """SequenceFile v6, uncompressed, key = empty Cascading tuple
    (ignored by the reader, as by the reference), periodic sync escapes."""
    out = io.BytesIO()
    out.write(b"SEQ\x06")
    write_string(out, "cascading.tuple.Tuple")
    write_string(out, "cascading.tuple.Tuple")
    out.write(b"\x00\x00")  # no compression, no block compression
    out.write(struct.pack(">i", 0))  # empty metadata map
    out.write(SYNC)
    key = encode_tuple([])  # arity-0 tuple: 1 byte
    for i, values in enumerate(tuples):
        if i and i % sync_every == 0:
            out.write(struct.pack(">i", -1))
            out.write(SYNC)
        val = encode_tuple(values)
        out.write(struct.pack(">i", len(key) + len(val)))
        out.write(struct.pack(">i", len(key)))
        out.write(key)
        out.write(val)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def test_vlong_encoding_pinned_to_hadoop_spec():
    # hand-derived from WritableUtils.writeVLong: single byte in
    # [-112, 127]; 128 -> {-113, 0x80}; 4096 -> {-114, 0x10, 0x00};
    # -113 -> {-121, 0x70} (negative path stores ~v)
    cases = {
        0: b"\x00",
        127: b"\x7f",
        -112: struct.pack("b", -112),
        128: struct.pack("b", -113) + b"\x80",
        4096: struct.pack("b", -114) + b"\x10\x00",
        -113: struct.pack("b", -121) + b"\x70",
        2**31 - 1: struct.pack("b", -116) + b"\x7f\xff\xff\xff",
    }
    for value, expected in cases.items():
        out = io.BytesIO()
        write_vlong(out, value)
        assert out.getvalue() == expected, value
        assert _read_vlong(io.BytesIO(expected)) == value


def test_tuple_codec_round_trip_all_tokens():
    values = [
        ("int", 42),
        ("long", 1 << 40),
        ("short", -7),
        ("float32", 1.5),
        2.25,
        "héllo",
        True,
        None,
    ]
    decoded, tokens = _decode_tuple(io.BytesIO(encode_tuple(values)))
    assert decoded == [42, 1 << 40, -7, 1.5, 2.25, "héllo", True, None]
    assert tokens == [4, 5, 7, 2, 3, 1, 6, 0]


def test_read_cascading_tuples_round_trip(spark, tmp_path):
    rows = [
        [("int", i), ("long", i * 10**10), f"name_{i}", i * 0.5, i % 2 == 0]
        for i in range(10)
    ]
    rows[3][2] = None  # a null string mid-file
    d = tmp_path / "casc"
    d.mkdir()
    write_seqfile(str(d / "part-00000"), rows[:6])
    write_seqfile(str(d / "part-00001"), rows[6:])
    df = read_cascading_tuples(
        spark, str(d), ["id", "big", "name", "score", "flag"]
    )
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "int", "bigint", "string", "double", "boolean"
    ]
    got = sorted(df.collect(), key=lambda r: r.id)
    assert len(got) == 10
    for i, r in enumerate(got):
        assert r.id == i and r.big == i * 10**10
        assert r.name == (None if i == 3 else f"name_{i}")
        assert r.score == i * 0.5 and r.flag == (i % 2 == 0)


def test_schema_discovery_scans_past_null_first_row(spark, tmp_path):
    # reference discovers types from the FIRST tuple and would fail on a
    # null slot; the shim scans forward for non-null evidence
    rows = [[None, ("int", 0)], ["late", ("int", 1)]]
    p = tmp_path / "nulls.seq"
    write_seqfile(str(p), rows)
    df = read_cascading_tuples(spark, str(p), ["s", "i"])
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "int"
    ]
    assert sorted(((r.s, r.i) for r in df.collect()), key=lambda t: t[1]) == [
        (None, 0), ("late", 1)
    ]


def test_non_primitive_token_raises_reference_error(spark, tmp_path):
    p = tmp_path / "nested.seq"
    write_seqfile(str(p), [[("token", 8)]])
    with pytest.raises(Exception, match="only primitive Java types"):
        read_cascading_tuples(spark, str(p), ["t"]).collect()


def test_wrong_value_class_and_bad_magic_raise(tmp_path):
    out = io.BytesIO()
    out.write(b"SEQ\x06")
    write_string(out, "org.apache.hadoop.io.Text")
    write_string(out, "org.apache.hadoop.io.Text")
    out.write(b"\x00\x00")
    out.write(struct.pack(">i", 0))
    out.write(SYNC)
    with pytest.raises(IOError, match="value class"):
        list(_iter_records(out.getvalue(), "x"))
    with pytest.raises(IOError, match="not a SequenceFile"):
        list(_iter_records(b"PAR1....", "x"))


def test_committed_fixture_frozen_layout(spark):
    """The committed fixture freezes the byte layout: a refactor that
    changes the writer cannot silently re-validate the reader."""
    fixture = os.path.join(
        os.path.dirname(__file__), "fixtures", "cascading_orders.seq"
    )
    df = read_cascading_tuples(
        spark, fixture, ["order_id", "amount_cents", "segment", "priority"]
    )
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "int", "bigint", "string", "int"
    ]
    got = sorted(df.collect())
    assert len(got) == 7
    assert got[0].order_id == 100 and got[0].segment == "BUILDING"
    assert sum(r.amount_cents for r in got) == 7 * 123456789
