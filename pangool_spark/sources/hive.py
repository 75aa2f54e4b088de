"""Hive/HCatalog table source.

Ref ``HCatTupleInputFormat`` (``P/tuplemr/mapred/lib/input/
HCatTupleInputFormat.java:42-102``): scan a metastore table, map its
primitive types onto tuple fields (all nullable). Spark: ``spark.read.table``
against the session catalog/metastore — types arrive as proper Spark types,
partition pruning and pushdown included for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pangool_spark.schema import Schema


def read_table(spark: SparkSession, table: str, target_schema: Schema | None = None) -> DataFrame:
    """Read ``db.table`` from the session catalog; optional evolution to a
    target schema (missing fields defaulted, extras dropped, types cast)."""
    df = spark.read.table(table)
    if target_schema is not None:
        df = target_schema.conform(df)
    return df


def write_table(
    df: DataFrame, table: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """Save as a catalog table (parquet-backed by default)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(table)
