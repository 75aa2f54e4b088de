"""Text sources/sinks with full TupleTextInputFormat option parity.

Reference (cites /root/reference/):
- CSV scan: separator/quote/escape, header skip, strict-quotes, null-string
  (``\\N``), per-column projection via FieldSelector, typed parsing —
  ``P/tuplemr/mapred/lib/input/TupleTextInputFormat.java:57-194``
  (FieldSelector :96-113), tokenizer ``NullableCSVTokenizer.java:33``.
- Fixed-width mode: (start,end) position pairs, null-string trim-compare —
  ``TupleTextInputFormat.java:144-185``, ``FixedWidthCSVTokenizer.java:33``.
- CSV sink: header from schema, null-string —
  ``P/tuplemr/mapred/lib/output/TupleTextOutputFormat.java:42-181``.

Spark mapping: every option is native to ``spark.read.csv`` / ``df.write.csv``
— the scan stays splittable, schema-typed, and column-pruned (FieldSelector
becomes real Catalyst column pruning on the selected fields).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pangool_spark.schema import Schema

NO_NULL_STRING = object()  # sentinel: no null-string handling at all


def read_csv(
    spark: SparkSession,
    path: str,
    schema: Schema,
    sep: str = ",",
    quote: str = '"',
    escape: str = "\\",
    header: bool = False,
    strict_quotes: bool = False,
    null_string: str | None = "\\N",
    field_selector: Sequence[int] | None = None,
) -> DataFrame:
    """CSV → typed DataFrame.

    ``field_selector`` mirrors FieldSelector: positions (0-based) in the file
    that map, in order, onto the schema's fields; unselected file columns are
    never read (column pruning reaches the scan).
    ``strict_quotes``: the reference nulls any value NOT enclosed in quotes
    (``NullableCSVTokenizer`` strictQuotes). Spark's CSV reader has no
    null-unquoted mode; the closest enforcement is failing on malformed
    quoting (``unescapedQuoteHandling=RAISE_ERROR``) — documented deviation.
    """
    reader = (
        spark.read.option("sep", sep)
        .option("quote", quote or "")
        .option("escape", escape or "")
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
    )
    if null_string is not None and null_string is not NO_NULL_STRING:
        reader = reader.option("nullValue", null_string)
    if strict_quotes:
        reader = reader.option("unescapedQuoteHandling", "RAISE_ERROR")

    if field_selector is None:
        return reader.schema(schema.to_struct()).csv(path)

    # FieldSelector: read raw positions as strings, project + cast.
    max_pos = max(field_selector)
    raw_ddl = ", ".join(f"_c{i} STRING" for i in range(max_pos + 1))
    raw = reader.schema(raw_ddl).csv(path)
    cols = [
        F.col(f"_c{pos}").cast(field.dtype).alias(field.name)
        for pos, field in zip(field_selector, schema.fields)
    ]
    return raw.select(*cols)


def write_csv(
    df: DataFrame,
    path: str,
    sep: str = ",",
    quote: str = '"',
    escape: str = "\\",
    header: bool = False,
    null_string: str = "\\N",
    mode: str = "overwrite",
) -> None:
    """CSV sink. Ref ``TupleTextOutputFormat.java:42-181``."""
    (
        df.write.mode(mode)
        .option("sep", sep)
        .option("quote", quote or "")
        .option("escape", escape or "")
        .option("header", str(header).lower())
        .option("nullValue", null_string)
        .csv(path)
    )


def read_fixed_width(
    spark: SparkSession,
    path: str,
    schema: Schema,
    positions: Sequence[tuple[int, int]],
    null_string: str | None = None,
) -> DataFrame:
    """Fixed-width text → typed DataFrame.

    ``positions`` are inclusive (start, end) character offsets per schema
    field, 0-based — the reference's int-pair convention
    (``TupleTextInputFormat.java:144-185``). Null-string comparison happens
    against the *trimmed* slice (``FixedWidthCSVTokenizer.java:33``).
    Implemented as a single projection of ``substring`` expressions over
    ``spark.read.text`` — narrow, splittable, codegen'd.
    """
    if len(positions) != len(schema.fields):
        raise ValueError("positions and schema fields must align")
    raw = spark.read.text(path)
    cols = []
    for (start, end), field in zip(positions, schema.fields):
        sliced = F.substring(F.col("value"), start + 1, end - start + 1)
        trimmed = F.trim(sliced)
        if null_string is not None:
            sliced = F.when(trimmed == null_string, F.lit(None)).otherwise(sliced)
        cols.append(F.trim(sliced).cast(field.dtype).alias(field.name))
    return raw.select(*cols)
