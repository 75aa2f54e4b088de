"""Loaders for the driver's testdata tables (TESTDATA.md).

One quirk: ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS),
which Spark's vectorized parquet reader rejects (PARQUET_TYPE_ILLEGAL).
``spark.sql.legacy.parquet.nanosAsLong=true`` (runtime-settable) reads it as
nanosecond longs; we convert to TimestampType by integer-truncating to
microseconds — bit-identical to how DuckDB casts NANOS → its microsecond
TIMESTAMP, so oracle comparisons line up exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer div, NOT /: double division rounds 19-digit nanos up
            # by 1µs for half the values; DuckDB truncates.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
