"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same configuration
keys are the ones that matter on a 1000-executor cluster (AQE, shuffle
partitions, Arrow for the Pandas-UDF escape hatches, broadcast threshold).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for scale-out behavior, not just local green-ness:
#  - AQE on: runtime partition coalescing + skew-join splitting replace the
#    hand-tuning Pangool users did with setCustomPartitionFields.
#  - Arrow on: every applyInPandas/mapInPandas escape hatch moves data in
#    columnar batches, never row-at-a-time pickling.
#  - shuffle.partitions is sized to cores locally; on a real cluster AQE
#    coalesces from a high initial number, so correctness never depends on it.
_DEFAULT_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    # Skip whole-stage codegen when the generated method exceeds HotSpot's
    # own huge-method JIT limit (8 KB bytecode): monster fused stages (e.g.
    # higher-order-function pipelines) otherwise run interpreted while C2
    # churns, with erratic 10-50x slowdowns.
    "spark.sql.codegen.hugeMethodLimit": "8000",
    # Bigger Arrow batches amortize the per-batch Python/pandas dispatch in
    # mapInPandas reducers (147k-group secondary sort: 3.9s -> 3.2s at
    # sf0.1); 64k rows of typical tuples stays well under task memory.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.driver.maxResultSize": "4g",
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "pangool_spark", **extra_confs: str) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    n_parallel = os.cpu_count() or 8
    builder = builder.config("spark.sql.shuffle.partitions", str(n_parallel))
    # 32 executor threads + cached relations + Arrow buffers: 16g heaps GC-
    # thrash on the bench suite (measured 2-4x tail-latency swings on the
    # dedup queries); the container has 128 GiB.
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    for key, value in {**_DEFAULT_CONFS, **extra_confs}.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine confs to an externally created session.

    The verification driver hands us its own SparkSession; static confs
    (memory, master) are out of our hands but SQL confs are not.
    """
    for key in (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.execution.arrow.pyspark.enabled",
        "spark.sql.session.timeZone",
        "spark.sql.codegen.hugeMethodLimit",
        "spark.sql.execution.arrow.maxRecordsPerBatch",
    ):
        try:
            spark.conf.set(key, _DEFAULT_CONFS[key])
        except Exception:  # pragma: no cover - conf may be static in some envs
            pass
    return spark
