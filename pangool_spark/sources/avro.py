"""Avro source/sink.

Ref ``P/tuplemr/avro/AvroInputFormat.java:45`` / ``AvroOutputFormat.java:52``
(container files, deflate codec + sync-interval options) and the Avro-field
column (string-array payload) in ``EX/avro/AvroTweetsJoin.java:132-144``.

Spark mapping: ``spark.read.format("avro")`` — but the spark-avro package is
an *external* jar that may be absent in this container, so both functions
degrade with a clear error. Avro-typed columns (arrays/maps/records) are
native Spark types; nothing else is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class AvroUnavailableError(RuntimeError):
    pass


def _check(spark: SparkSession) -> None:
    try:
        spark._jvm.org.apache.spark.sql.avro.functions  # noqa: B018
    except Exception as exc:  # pragma: no cover - depends on jar presence
        raise AvroUnavailableError(
            "spark-avro jar not on the classpath; add "
            "org.apache.spark:spark-avro_2.13 to spark.jars.packages"
        ) from exc


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    _check(spark)
    return spark.read.format("avro").load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite", compression: str = "deflate") -> None:
    _check(df.sparkSession)
    df.write.mode(mode).option("compression", compression).format("avro").save(path)
