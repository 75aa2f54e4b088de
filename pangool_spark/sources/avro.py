"""Avro source/sink.

Ref ``P/tuplemr/avro/AvroInputFormat.java:45`` / ``AvroOutputFormat.java:52``
(container files, deflate codec + sync-interval options) and the Avro-field
column (string-array payload) carried through a join in
``EX/avro/AvroTweetsJoin.java:60-158``.

Two engines behind one API:

1. **spark-avro jar** (``spark.read.format("avro")``) when it is on the
   classpath — the scale path: splittable scans, predicate pushdown,
   zero Python in the row path.
2. **Pure-Python container codec** (``avro_codec.py``, public Avro spec)
   otherwise: files are listed driver-side, then decoded IN PARALLEL — the
   path list is distributed and each task streams its files through
   ``mapInPandas`` (Arrow-batched out). Writes emit one container file per
   partition, like any Hadoop committer. Scales with the file count;
   single files are single-task (container blocks are not split).
"""

from __future__ import annotations

import glob
import os
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class AvroUnavailableError(RuntimeError):
    pass


def _jar_available(spark: SparkSession) -> bool:
    try:
        # the authoritative probe: ask Catalyst's data-source registry
        # (class-existence checks lie — spark-sql ships some avro classes
        # without registering the format)
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        files = sorted(
            glob.glob(os.path.join(path, "**", "*.avro"), recursive=True)
        )
    else:
        files = sorted(glob.glob(path)) if any(c in path for c in "*?[") else [path]
    if not files:
        raise FileNotFoundError(f"no avro files at {path!r}")
    return files


def read_avro(
    spark: SparkSession, path: str, split_bytes: int = 32 * 1024 * 1024
) -> DataFrame:
    """Read .avro container files (a file, a directory, or a glob).

    Pure-Python path is SPLITTABLE: files larger than ``split_bytes`` are
    divided into byte ranges and each task syncs to the first block
    boundary in its range (the container format's sync markers exist for
    exactly this), so one big file still reads in parallel.
    """
    if _jar_available(spark):
        return spark.read.format("avro").load(path)

    import pandas as pd

    from pangool_spark.sources import avro_codec

    files = _list_files(path)
    # schema from the first file's header (one small driver-side read)
    avro_schema = avro_codec.read_container_schema(files[0])
    struct = avro_codec.avro_to_spark_schema(avro_schema)
    splits = []
    for f in files:
        size = os.path.getsize(f)
        n_splits = max(1, size // split_bytes)
        step = (size + n_splits - 1) // n_splits
        for s in range(0, size, step):
            splits.append((f, s, min(s + step, size)))
    n_parts = min(len(splits), spark.sparkContext.defaultParallelism)
    splits_df = spark.createDataFrame(
        splits, "__path__ STRING, __start__ LONG, __end__ LONG"
    ).repartition(n_parts)

    col_names = [f.name for f in struct.fields]

    def decode(batches):
        for pdf in batches:
            for p, s, e in zip(pdf["__path__"], pdf["__start__"], pdf["__end__"]):
                # Heterogeneous directories fail loudly: silently conforming
                # every file to the first header (extra fields dropped,
                # missing → NaN) corrupts data without a trace.
                file_schema = avro_codec.read_container_schema(p)
                if file_schema != avro_schema:
                    raise avro_codec.AvroCodecError(
                        f"avro schema mismatch: {p!r} does not match the "
                        f"directory's first file ({files[0]!r}); read the "
                        "files separately or rewrite them to one schema"
                    )
                rows: list[dict] = []
                for rec in avro_codec.read_container_split(p, int(s), int(e)):
                    rows.append(rec)
                    if len(rows) >= 10000:
                        yield pd.DataFrame(rows, columns=col_names)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=col_names)

    return splits_df.mapInPandas(decode, schema=struct)


def write_avro(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "deflate",
    sync_interval: int = 16000,
) -> None:
    """Write a DataFrame as .avro container files (one per partition)."""
    if _jar_available(df.sparkSession):
        df.write.mode(mode).option("compression", compression).format("avro").save(path)
        return

    import shutil
    import uuid

    import pandas as pd

    from pangool_spark.sources import avro_codec

    if mode not in ("overwrite", "append", "ignore", "error", "errorifexists"):
        raise ValueError(f"unknown save mode {mode!r}")
    if os.path.exists(path):
        if mode == "overwrite":
            shutil.rmtree(path)
        elif mode in ("error", "errorifexists"):
            raise FileExistsError(path)
        elif mode == "ignore":
            return  # jar-path parity: existing output is left untouched
    os.makedirs(path, exist_ok=True)
    avro_schema = avro_codec.spark_to_avro_schema(df.schema, name="topLevelRecord")
    codec = {"deflate": "deflate", "uncompressed": "null", "null": "null"}.get(compression)
    if codec is None:
        raise avro_codec.AvroCodecError(f"unsupported compression {compression!r}")
    ts_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampType)]

    def write_partition(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()

        def records() -> Iterable[dict]:
            for pdf in batches:
                for c in ts_cols:
                    pdf[c] = pdf[c].dt.to_pydatetime()
                for rec in pdf.to_dict("records"):
                    yield {
                        k: (None if _is_na_scalar(v) else v) for k, v in rec.items()
                    }

        out = os.path.join(path, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.avro")
        n = avro_codec.write_container(
            out, records(), avro_schema, codec=codec, sync_interval=sync_interval
        )
        yield pd.DataFrame({"path": [out], "n": [n]})

    (
        df.mapInPandas(write_partition, schema="path STRING, n LONG")
        .collect()  # the action that performs the write
    )


def _is_na_scalar(v) -> bool:
    import pandas as pd

    if v is None:
        return True
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False  # arrays/dicts: never scalar-NA
