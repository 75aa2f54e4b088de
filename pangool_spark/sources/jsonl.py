"""JSON-Lines source/sink — the de-facto interchange format for text
corpora (C4, The Pile, RedPajama ship as .jsonl/.jsonl.gz).

No direct reference counterpart (closest is the delimited-text surface of
``TupleTextInputFormat``, ``P/tuplemr/mapred/lib/input/
TupleTextInputFormat.java``); Spark-first: ``spark.read.json`` already
gives a splittable, schema-aware, predicate-pushdown-capable scan, so this
module only pins the corpus-pipeline conventions on top:

- an EXPLICIT schema by default (schema inference reads the whole corpus
  once before the real scan — a full extra pass at 100 TB);
- ``Schema.conform`` target-schema evolution, same semantics as tuple
  files (missing fields defaulted, extras dropped, types widened);
- corrupt-line policy surfaced as a keyword, not a buried option.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pangool_spark.schema import Schema

_MODES = {"permissive": "PERMISSIVE", "drop": "DROPMALFORMED", "strict": "FAILFAST"}


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: Schema | None = None,
    on_corrupt: str = "strict",
    multiline: bool = False,
) -> DataFrame:
    """Read JSON-Lines. With ``schema`` the scan never runs inference (the
    100 TB default — inference is a full extra pass) and the result is
    conformed to it; without, Spark infers (small/exploratory data only).

    ``on_corrupt``: ``strict`` fail the job (default — silent row loss in
    a training corpus is unfindable later), ``drop`` discard bad lines,
    ``permissive`` null-fill them.
    """
    if on_corrupt not in _MODES:
        raise ValueError(f"unknown on_corrupt {on_corrupt!r}: {sorted(_MODES)}")
    reader = spark.read.option("mode", _MODES[on_corrupt])
    if multiline:
        reader = reader.option("multiLine", "true")
    if schema is None:
        return reader.json(path)
    df = reader.schema(schema.to_struct()).json(path)
    return schema.conform(df)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "error",
    compression: str | None = "gzip",
    partition_by: list[str] | None = None,
) -> None:
    """Write JSON-Lines, gzip-compressed by default (the corpus-exchange
    convention; one file per task, so parallelism is preserved despite
    gzip being unsplittable — re-ingest splits across FILES)."""
    writer = df.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
