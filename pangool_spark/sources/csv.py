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


def tokenize_line(
    line: str,
    sep: str = ",",
    quote: str | None = '"',
    escape: str | None = "\\",
    strict_quotes: bool = False,
    null_string: str | None = None,
) -> list[str | None]:
    """Reference-exact CSV tokenization of ONE line (no embedded newlines).

    Semantics ported from ``NullableCSVTokenizer.java:33-166`` (behavior,
    not code): a value is null when (a) strict quotes are on and the value
    was not quoted, or (b) a null string is configured and an UNQUOTED
    value equals it (empty null string also matches whitespace-only
    values). Quoted values are never null. The escape character is only
    honored INSIDE quotes; after a closing quote, characters up to the next
    separator are discarded.
    """
    use_quotes = quote is not None and quote != ""
    use_escape = escape is not None and escape != ""

    def classify(buf: str, was_quoted: bool) -> str | None:
        if use_quotes and was_quoted:
            return buf
        if use_quotes and not was_quoted and strict_quotes:
            return None
        if null_string is not None and (
            buf == null_string or (null_string == "" and buf.strip() == "")
        ):
            return None
        return buf

    tokens: list[str | None] = []
    buf: list[str] = []
    state = "normal"  # normal | quoted | quoted_finished
    quoted = False
    i, n = 0, len(line)
    while i <= n:
        c = line[i] if i < n else "\n"  # virtual trailing newline = end of record
        if state == "normal":
            if c == sep or c == "\n":
                tokens.append(classify("".join(buf), quoted))
                buf.clear()
                quoted = False
                if c == "\n":
                    return tokens
            elif use_quotes and c == quote:
                buf.clear()
                state = "quoted"
                quoted = True
            else:
                buf.append(c)
        elif state == "quoted":
            if use_escape and c == escape:
                if i + 1 < n:
                    buf.append(line[i + 1])
                    i += 1
            elif c == quote:
                state = "quoted_finished"
            elif c == "\n":
                # single-line contract: unclosed quote consumes to EOL
                raise ValueError(f"unclosed quote in line: {line!r}")
            else:
                buf.append(c)
        else:  # quoted_finished: discard until the next separator
            if c == sep or c == "\n":
                state = "normal"
                continue
        i += 1
    return tokens


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
    (``NullableCSVTokenizer.java:87-95`` strictQuotes). Spark's native CSV
    reader has no null-unquoted mode, so this routes through the
    reference-exact ``tokenize_line`` state machine over ``spark.read.text``
    (still splittable; Python tokenization is Arrow-batched). Deviation:
    quoted values spanning physical lines are unsupported on this path.
    """
    if strict_quotes:
        ns = None if null_string is NO_NULL_STRING else null_string
        return _read_csv_parity(
            spark, path, schema, sep, quote, escape, header, True, ns, field_selector
        )
    reader = (
        spark.read.option("sep", sep)
        .option("quote", quote or "")
        .option("escape", escape or "")
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
    )
    if null_string is not None and null_string is not NO_NULL_STRING:
        reader = reader.option("nullValue", null_string)

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


def _read_csv_parity(
    spark: SparkSession,
    path: str,
    schema: Schema,
    sep: str,
    quote: str | None,
    escape: str | None,
    header: bool,
    strict_quotes: bool,
    null_string: str | None,
    field_selector: Sequence[int] | None,
) -> DataFrame:
    """Tokenizer-parity CSV path: Hadoop ``TextInputFormat`` (byte offset,
    line) records + per-partition Python tokenization with the reference
    state machine. Header rows are dropped POSITIONALLY — the line at byte
    offset 0 of each file — exactly like the reference's per-split
    skip-header (``TupleTextInputFormat`` on Hadoop's TextInputFormat),
    so a header that differs from the schema field names is still dropped,
    and a data line that happens to equal the header string is kept. The
    scan stays splittable (offsets come from the input format, not a
    driver-side pass). This path is the strict-quotes compatibility route;
    the native ``spark.read.csv`` fast path handles everything else."""
    from pyspark.sql import types as T

    fields = list(schema.fields)
    if field_selector is not None:
        width = max(field_selector) + 1
        positions = list(field_selector)
    else:
        width = len(fields)
        positions = list(range(width))

    pairs = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
    )
    if header:
        pairs = pairs.filter(lambda kv: kv[0] != 0)

    out_struct = T.StructType([T.StructField(f"_t{i}", T.StringType(), True) for i in range(width)])

    def tok_part(it):
        for _, ln in it:
            tok = tokenize_line(ln, sep, quote, escape, strict_quotes, null_string)
            yield tuple((tok + [None] * width)[:width])

    tokens = spark.createDataFrame(pairs.mapPartitions(tok_part), out_struct)
    cols = [
        F.col(f"_t{pos}").cast(field.dtype).alias(field.name)
        for pos, field in zip(positions, fields)
    ]
    return tokens.select(*cols)


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
