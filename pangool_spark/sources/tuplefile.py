""""Tuple files": the engine's native schema-ful binary storage.

Reference: SequenceFile container with the schema in file metadata, optional
read-time target-schema evolution (``P/tuplemr/mapred/lib/input/
TupleInputFormat.java:40-57``, ``P/io/TupleFile.java:46-277``, evolution
``P/tuplemr/serialization/SimpleTupleDeserializer.java:87-110``).

Spark-first verdict: parquet *is* the tuple file — self-describing schema,
splittable, columnar, compressed, with predicate pushdown the reference never
had. Target-schema evolution (missing fields defaulted, extra fields
dropped, type widening) is ``Schema.conform`` after the scan, which Catalyst
collapses into the scan's projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pangool_spark.schema import Schema


def read_tuples(
    spark: SparkSession,
    path: str,
    target_schema: Schema | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Read a tuple file; ``target_schema`` applies evolution semantics."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(path)
    if target_schema is not None:
        df = target_schema.conform(df)
    return df


def write_tuples(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """Write a tuple file (ref ``TupleOutputFormat.java:41-94``; SequenceFile
    codecs → parquet codecs). ``partition_by`` doubles as the reference's
    dynamic named-output subfolders (``PangoolMultipleOutputs``)."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
