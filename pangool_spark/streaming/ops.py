"""Streaming operators (extension; no reference counterpart — SURVEY §2.11).

Modeled on the driver's ``events`` fixture table
(event_id, ts, user_id, event_type, value, props). Each operator works on
both a streaming DataFrame (from ``read_stream``) and a batch DataFrame with
identical semantics, so the oracle checks run the batch path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hadoop_path_exists(spark: SparkSession, path: str) -> bool:
    """Scheme-agnostic existence check via the Hadoop FileSystem API —
    distinguishes "state genuinely absent" (first batch) from transient
    read failures, which must propagate and fail the micro-batch."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def read_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-based stream source (parquet/json/csv directory).

    ``maxFilesPerTrigger`` bounds per-micro-batch work — the knob that keeps
    backfill over a 100 TB directory from becoming one giant batch.
    """
    reader = (
        spark.readStream.format(fmt)
        .schema(schema if isinstance(schema, T.StructType) else T._parse_datatype_string(schema))
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
    )
    return reader.load(path)


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    slide: str | None = None,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Event-time tumbling/sliding window aggregate with late-data watermark.

    On a stream the watermark bounds state: windows older than it are
    finalized and evicted. On a batch frame the same expression computes the
    identical grouped result (watermark is a no-op), which is how the oracle
    verifies it. ``watermark=None`` skips setting one (an upstream op may
    already have).
    """
    if df.isStreaming and watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    grouped = df.groupBy(win.alias("window"), *[F.col(k) for k in keys])
    agged = grouped.agg(*aggs)
    # agg output names read from the result schema itself (columns after the
    # window struct + keys) — no private-API expression-string parsing, works
    # for unaliased aggregates and under Spark Connect alike.
    agg_names = agged.columns[1 + len(keys):]
    return agged.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[F.col(k) for k in keys],
        *[agged[c] for c in agg_names],
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Session windows per user: events within ``gap`` of each other merge.

    Streaming path: native ``session_window`` (state-store backed, watermark
    evicts closed sessions). Batch path: same expression.
    Output: (user_id, session_start, session_end, n_events, total_value).
    ``watermark=None`` skips setting one (required when an upstream operator
    like ``stream_dedup`` already set it — Spark forbids redefining it).
    """
    if df.isStreaming and watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    sw = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(sw.alias("s"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col(user_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stateful_running_totals(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    timeout_minutes: int = 60,
) -> DataFrame:
    """Custom stateful operator: per-key running (count, sum) maintained in
    the state store across micro-batches via ``applyInPandasWithState``.

    The reference has no streaming at all (SURVEY §2.11); this is the
    Spark-first escape hatch for stateful logic the built-in aggregations
    can't express (the streaming analog of TupleReducer). State is a single
    (count, total) pair per key; idle keys expire after
    ``timeout_minutes`` of processing time.

    On a batch DataFrame, falls back to the equivalent groupBy aggregate
    (same output schema) so the semantics stay oracle-checkable.
    """
    from pyspark.sql import functions as F

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType(), False),
            T.StructField("n_events", T.LongType(), False),
            T.StructField("total_value", T.DoubleType(), True),
        ]
    )
    if not df.isStreaming:
        return df.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double").alias("total_value"),
        )

    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType(), False),
            T.StructField("total_micros", T.LongType(), False),
        ]
    )

    def update(key, pdfs, state):
        import pandas as pd

        n, total_micros = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # accumulate exact integer micro-units (order-independent)
            total_micros += int((pdf[value_col] * 1_000_000).round().sum())
        state.update((n, total_micros))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [total_micros / 1_000_000]}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def stream_dedup(
    df: DataFrame, keys: Sequence[str] = ("event_id",), ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once event dedup within the watermark horizon.

    ``dropDuplicates`` on a stream keeps per-key state; the watermark bounds
    it (keys older than the horizon are forgotten — the standard trade).
    """
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
        return df.dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))


def stream_minhash_filter(
    stream: DataFrame,
    ref_signatures: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int | None = 16,
    threshold: float = 0.5,
    max_index_rows: int | None = 1_000_000,
) -> DataFrame:
    """Streaming NEAR-dedup against a persisted MinHash signature index —
    the streaming counterpart of ``dedup.minhash_lsh_against``: arriving
    documents whose estimated Jaccard vs ANY indexed document clears
    ``threshold`` are dropped; survivors pass through unchanged.

    Shape: STATELESS Arrow-batched projection-filter (the
    ``contamination_filter`` pattern) — the banded index is materialized
    driver-side once and shipped in the task closure, each row computes
    its own portable-family signature in numpy
    (``dedup.py_minhash_signature``, pinned signature-for-signature
    against the Spark operator), probes the band buckets, and verifies
    slot agreement against only the bucket's candidates. No joins, no
    state store, no watermark — runs identically on a batch DataFrame,
    which is how the parity test pins it against ``minhash_lsh_against``.

    Bounded-broadcast contract: the index costs ``num_hashes`` longs per
    indexed doc (~0.5 GB per 10^6 docs at 64 hashes) and must fit in the
    closure; ``max_index_rows`` ENFORCES the contract — an over-sized
    index raises before anything is collected driver-side (pass ``None``
    to waive the guard on hosts sized for it). Beyond closure scale, run
    the batch op (``dedup.minhash_lsh_against``) per micro-batch via
    ``foreachBatch`` instead — that path shuffles the index rather than
    shipping it. The index must be built with the SAME
    ``n``/``num_hashes`` and the portable hash family; wrong-length
    signatures raise at build time (a silently-skipped index would admit
    every duplicate).
    """
    import numpy as np

    from pangool_spark.operators.dedup import (
        minhash_params_for_threshold,
        py_minhash_signatures_batch,
    )

    if bands is None:
        bands, _ = minhash_params_for_threshold(threshold, num_hashes)
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    if max_index_rows is not None:
        probe = ref_signatures.limit(max_index_rows + 1).count()
        if probe > max_index_rows:
            raise ValueError(
                f"stream_minhash_filter: signature index exceeds "
                f"max_index_rows={max_index_rows} (~{num_hashes} longs/doc "
                "would be collected into the task closure). Run "
                "dedup.minhash_lsh_against per micro-batch via "
                "foreachBatch instead, or raise max_index_rows explicitly "
                "if the driver/executors are sized for the broadcast."
            )
    rows = ref_signatures.select(id_col, "signature").collect()
    bad = [row[id_col] for row in rows if len(row["signature"]) != num_hashes]
    if bad:
        raise ValueError(
            f"stream_minhash_filter: {len(bad)} index rows have signature "
            f"length != num_hashes={num_hashes} (e.g. id {bad[0]}); the "
            "index was built with different parameters"
        )
    sig_mat = (
        np.array([row["signature"] for row in rows], dtype=np.int64)
        if rows
        else np.empty((0, num_hashes), dtype=np.int64)
    )
    buckets: dict = {}
    for i in range(len(rows)):
        for b in range(bands):
            key = (b, tuple(sig_mat[i, b * r : (b + 1) * r]))
            buckets.setdefault(key, []).append(i)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                yield pdf
                continue
            # one vectorized signature pass per Arrow batch: distinct
            # shingles hashed once, permutation mins as a single numpy op
            sigs = py_minhash_signatures_batch(pdf[text_col], n, num_hashes)
            keep = []
            for sig in sigs:
                if sig is None or not buckets:
                    keep.append(True)
                    continue
                cand: set = set()
                for b in range(bands):
                    cand.update(
                        buckets.get((b, tuple(sig[b * r : (b + 1) * r])), ())
                    )
                if not cand:
                    keep.append(True)
                    continue
                est = (sig_mat[sorted(cand)] == sig).mean(axis=1)
                keep.append(not bool((est >= threshold).any()))
            yield pdf[keep]

    return stream.mapInPandas(run, schema=stream.schema)


def stream_dedup_against(
    stream: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """Streaming INCREMENTAL exact dedup: drop arriving documents whose
    normalized content digest already exists in a STANDING (static)
    corpus — the ingest-time half of ``dedup.incremental_dedup``.

    Shape: a stream-static LEFT ANTI join on the 16-byte md5 digest. The
    static side is the distinct digest relation, not the corpus itself;
    no streaming state at all (unlike ``stream_dedup``, which keeps
    per-key state for WITHIN-stream dupes — compose both for the full
    ingest pipeline). Works identically on a batch DataFrame, which is
    how the parity test pins it against ``incremental_dedup``'s exact
    stage.

    ``broadcast=True`` (default) hints the digest set to every task —
    right while it fits executor memory (16 bytes × distinct docs: ~1.6 GB
    per 10^8 docs). Against a truly 100 TB standing corpus the distinct
    digests are billions of rows / tens of GB, where a forced broadcast
    OOMs the driver: pass ``broadcast=False`` to fall back to a shuffled
    stream-static anti-join (each micro-batch shuffles on the digest).
    """
    from pangool_spark.operators.norm import content_digest

    seen = corpus.select(content_digest(text_col).alias("__digest__")).distinct()
    if broadcast:
        seen = F.broadcast(seen)
    return (
        stream.withColumn("__digest__", content_digest(text_col))
        .join(seen, "__digest__", "left_anti")
        .drop("__digest__")
    )


def stream_cms(
    stream: DataFrame,
    key_col: str,
    state_dir: str,
    width: int = 8192,
    depth: int = 4,
    hash_family: str = "fast",
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
):
    """Streaming count-min maintenance: each micro-batch sketches its
    keys into the depth×width grid and MERGES cell-wise into a standing
    on-disk sketch — frequency monitoring over an unbounded stream with
    CONSTANT state (the grid never grows, unlike per-key streaming
    aggregation whose state is the key cardinality).

    foreachBatch + the batch operators (``count_min_sketch`` /
    ``merge_sketches``): the same algebra the incremental-agg path uses,
    so stream-maintained and batch-rebuilt grids are IDENTICAL — the
    stream==batch parity test pins it. The state parquet is rewritten
    per batch (≤ depth·width rows — trivially small); probe it any time
    with ``cms_estimate`` (the extra ``last_batch_id`` bookkeeping
    column is ignored by the probe).

    Exactly-once fold (the ``stream_histogram_drift`` pattern): the
    standing grid carries the id of the last batch folded into it, so a
    micro-batch replayed after a failure between the state overwrite and
    the checkpoint commit is skipped instead of double-counted.

    Returns the StreamingQuery (caller awaits termination).
    """
    from pangool_spark.operators.sketch import count_min_sketch, merge_sketches

    def _merge(batch_df, batch_id):
        spark = batch_df.sparkSession
        batch_sketch = count_min_sketch(
            batch_df, key_col, width, depth, hash_family
        )
        # Only treat a GENUINELY missing standing sketch as "first
        # batch". A transient FS error or a partially-written state dir
        # must re-raise (failing the micro-batch so Structured Streaming
        # retries it), never silently reset the accumulated counts to
        # this batch alone.
        if _hadoop_path_exists(spark, state_dir):
            standing = spark.read.parquet(state_dir)
            applied = (
                standing.agg(F.max("last_batch_id")).collect()[0][0]
                if "last_batch_id" in standing.columns
                else None
            )
            if applied is not None and int(batch_id) <= int(applied):
                return  # replay of an already-folded batch: no-op
            merged = merge_sketches(
                standing.select("j", "bucket", "n"), batch_sketch
            )
        else:
            merged = batch_sketch
        # rewrite via a staging temp view: the grid is tiny, and collect/
        # recreate keeps the read+overwrite of the SAME path safe
        rows = merged.collect()
        spark.createDataFrame(rows, merged.schema).withColumn(
            "last_batch_id", F.lit(int(batch_id)).cast("bigint")
        ).coalesce(1).write.mode("overwrite").parquet(state_dir)

    writer = stream.writeStream.foreachBatch(_merge).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_outliers(
    stream_df: DataFrame,
    stats_df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    z: float = 3.0,
) -> DataFrame:
    """Streaming anomaly flagging against BATCH baselines: score each
    arriving row's value against precomputed per-group (n, Σy, Σy²)
    stats (``stats.outlier_stats`` over the reference table) via a
    stream-static join — the model-scoring shape: baselines from
    yesterday's batch, flags on the live stream, zero state, no
    watermark needed (each row scores independently).

    Works identically on a batch ``stream_df`` (the join degrades to a
    plain equi-join), so stream == batch parity is directly testable
    and the batch path value-oracles the arithmetic.
    """
    from pangool_spark.operators.stats import score_outliers

    if stats_df.isStreaming:
        raise ValueError(
            "stats_df must be a static (batch) relation — compute it "
            "with stats.outlier_stats over the reference table"
        )
    return score_outliers(stream_df, stats_df, group_cols, value_col, z)


def stream_ewma(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: "tuple[str, ...]" = ("ts", "event_id"),
    value_col: str = "value",
    alpha: float = 0.3,
    timeout_minutes: int = 60,
) -> DataFrame:
    """Per-key EWMA maintained across micro-batches — the streaming twin
    of ``operators.windows.ewma`` (same recursion, same seed-with-first
    contract): state is one (n, acc) pair per key; each micro-batch
    sorts its rows by ``order_cols`` and folds them through
    ``acc = alpha*x + (1-alpha)*acc`` sequentially.

    Ordering caveat (inherent to update-mode state ops): the fold is
    exact event-order only when batches arrive in order — rows are
    sorted WITHIN a batch, but a late row landing in a later batch
    folds late. Equal to the batch operator whenever arrival respects
    event order (pinned in tests on real micro-batch runs). The fold
    itself is a Python loop over the batch — EWMA is sequential by
    definition; the per-row cost is bounded by the micro-batch, and the
    bit-identical recursion is what makes stream == batch checkable.

    On a batch DataFrame, falls back to ``windows.ewma`` (same schema).
    """
    if not df.isStreaming:
        from pangool_spark.operators.windows import ewma

        return ewma(
            df, [key_col], list(order_cols), value_col, alpha, out_col="ewma"
        )

    # Key type follows the input (string user ids are as valid as bigints)
    # — matching the batch twin ``windows.ewma``, which accepts any key
    # type; hardcoding LongType here would fail non-bigint keys at runtime.
    out_schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType, False),
            T.StructField("n_obs", T.LongType(), False),
            T.StructField("ewma", T.DoubleType(), True),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType(), False),
            T.StructField("acc", T.DoubleType(), False),
        ]
    )
    beta = 1.0 - alpha

    def update(key, pdfs, state):
        import pandas as pd

        n, acc = state.get if state.exists else (0, 0.0)
        # a key's micro-batch arrives as MULTIPLE Arrow chunks in shuffle
        # order — sorting each chunk alone folds out of order (measured
        # under load); materialize the batch (bounded per key) and sort ONCE
        frames = [p for p in pdfs if len(p)]
        if frames:
            batch = pd.concat(frames).sort_values(list(order_cols))
            for x in batch[value_col].astype(float):
                acc = x if n == 0 else alpha * x + beta * acc
                n += 1
        state.update((n, float(acc)))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {key_col: [key[0]], "n_obs": [n], "ewma": [acc if n else None]}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def read_upsert_snapshot(spark, state_dir: str) -> DataFrame:
    """Resolve the CURRENT snapshot written by ``stream_upsert``: read the
    tiny pointer file, load that version directory, hide tombstones and
    the bookkeeping column. Raises if no snapshot exists yet."""
    import os

    ptr = os.path.join(state_dir, "_LATEST")
    with open(ptr) as f:
        version = f.read().strip()
    raw = spark.read.parquet(os.path.join(state_dir, version))
    return raw.filter(~F.col("__deleted__")).drop("__deleted__")


def stream_upsert(
    stream: DataFrame,
    keys: "Sequence[str]",
    order_by: "Sequence[str]",
    state_dir: str,
    delete_col: str | None = None,
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
    keep_versions: int = 2,
):
    """Streaming CDC APPLY: fold a change stream into a standing
    key-level snapshot — the materialized-table half of every CDC
    pipeline. Semantics are pure last-writer-wins in ``order_by``
    (make its last column unique for a deterministic winner),
    VERSION-COMPARED against the standing state rather than blindly
    replaced: micro-batch boundaries carry no meaning, so a change
    that arrives in a later batch with an older version can never
    clobber a newer standing row (file-source splits genuinely
    reorder deliveries — the parity test pins this). Deletes
    (``delete_col`` true) are versioned TOMBSTONES: they win by the
    same order rule, readers never see them, and they stay in the
    state so late-arriving older updates cannot resurrect the key
    (prune by watermark when retention matters — the algebra is
    unchanged).

    Each micro-batch costs one ``keep_latest`` over (standing ∪
    batch-latest) — O(snapshot + batch), the parquet-rewrite regime;
    swap the sink for a MERGE-capable table format at 100 TB.
    Snapshot storage is VERSIONED: each batch writes a full new
    ``v{batch_id}`` directory and atomically flips a tiny ``_LATEST``
    pointer (the snapshot-isolation move table formats make — readers
    never observe a half-rewritten snapshot), keeping the last
    ``keep_versions`` versions.

    Returns the StreamingQuery (caller awaits termination); read the
    result with ``read_upsert_snapshot``.
    """
    import os
    import shutil

    from pangool_spark.operators.upsert import keep_latest

    if not keys:
        raise ValueError("keys must be non-empty")
    if not order_by:
        raise ValueError("order_by must be non-empty (last-writer-wins "
                         "needs a version order)")
    if keep_versions < 1:
        raise ValueError(
            f"keep_versions must be >= 1 (0 would prune the CURRENT "
            f"snapshot), got {keep_versions}"
        )

    def _apply(batch_df, batch_id):
        spark = batch_df.sparkSession
        if delete_col is not None:
            batch = batch_df.withColumn(
                "__deleted__", F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
        else:
            batch = batch_df.withColumn("__deleted__", F.lit(False))
        latest = keep_latest(batch, list(keys), list(order_by))
        ptr = os.path.join(state_dir, "_LATEST")
        vdir = f"v{batch_id}"
        if os.path.exists(ptr):
            with open(ptr) as f:
                version = f.read().strip()
            if version == vdir:
                # Crash-recovery replay: a previous attempt of THIS batch
                # already wrote v{batch_id} and flipped the pointer (the
                # flip happens only after the write commits), then died
                # before the streaming checkpoint recorded the batch. The
                # standing snapshot already reflects this batch's changes
                # (keep_latest replay over identical inputs is a no-op),
                # and re-merging would read and overwrite the SAME
                # directory — which Spark aborts. Skip: the state is
                # final for this batch, only the checkpoint needs to
                # advance.
                return
            standing = spark.read.parquet(os.path.join(state_dir, version))
            merged = keep_latest(
                standing.unionByName(latest), list(keys), list(order_by)
            )
        else:
            merged = latest
        merged.write.mode("overwrite").parquet(os.path.join(state_dir, vdir))
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            f.write(vdir)
        os.replace(tmp, ptr)  # atomic pointer flip
        versions = sorted(
            (d for d in os.listdir(state_dir) if d.startswith("v")),
            key=lambda d: int(d[1:]),
        )
        # Never prune the version the pointer references: after a
        # checkpoint reset, replayed batch ids restart at 0, so the
        # CURRENT version can be numerically lower than stale dirs from
        # the previous run — a numeric-order prune would delete the live
        # snapshot out from under the pointer (measured: PATH_NOT_FOUND
        # on the next batch's standing read).
        for old in versions[:-keep_versions]:
            if old != vdir:
                shutil.rmtree(os.path.join(state_dir, old), ignore_errors=True)

    writer = stream.writeStream.foreachBatch(_apply).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_point_in_time_join(
    stream: DataFrame,
    history: DataFrame,
    keys: "Sequence[str]",
    probe_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    attr_cols: "Sequence[str] | None" = None,
    prefix: str = "pit_",
    allow_exact: bool = True,
) -> DataFrame:
    """STREAM-STATIC point-in-time join — the online feature-lookup
    shape: every arriving probe row attaches the STATIC SCD2 history
    version whose ``[valid_from, valid_to)`` interval contains its
    timestamp (the serving twin of ``operators.upsert
    .point_in_time_join``; same leakage-free semantics, same prefixed
    attr + validity output, NULL row when no interval contains the
    probe ts).

    Plan shape: the batch operator's one-exchange union-sort as-of
    window cannot run on a stream (arbitrary window functions are not
    streamable), but for a STATIC history the interval membership IS
    directly joinable — a stream-static LEFT join on key equality +
    the interval predicate, which Spark broadcasts when the history
    fits. Each probe matches at most one version because a well-formed
    SCD2 history has disjoint per-key intervals (``scd2_history``
    guarantees this), so no post-join dedup is needed — the condition
    the parity test pins against the batch operator on real
    micro-batches.

    On a batch DataFrame, falls back to ``point_in_time_join`` (same
    output schema).
    """
    from pangool_spark.operators.upsert import point_in_time_join

    ks = list(keys)
    if not stream.isStreaming:
        return point_in_time_join(
            stream, history, ks, probe_ts, valid_from, valid_to,
            attr_cols, prefix, allow_exact,
        )
    attrs = list(attr_cols) if attr_cols is not None else [
        c for c in history.columns
        if c not in (*ks, valid_from, valid_to, "is_current")
    ]
    if not attrs:
        raise ValueError(
            "stream_point_in_time_join: no attribute columns to attach"
        )
    h = history.select(
        *[F.col(k).alias(f"__hk_{k}__") for k in ks],
        F.col(valid_from).alias(f"{prefix}{valid_from}"),
        F.col(valid_to).alias(f"{prefix}{valid_to}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in attrs],
    )
    ts = F.col(probe_ts)
    vfrom = F.col(f"{prefix}{valid_from}")
    vto = F.col(f"{prefix}{valid_to}")
    cond = (ts >= vfrom) if allow_exact else (ts > vfrom)
    cond = cond & (vto.isNull() | (ts < vto))
    for k in ks:
        cond = cond & (F.col(k) == F.col(f"__hk_{k}__"))
    joined = stream.join(h, cond, "left")
    return joined.select(
        *stream.columns,
        *[F.col(f"{prefix}{c}") for c in attrs],
        vfrom,
        vto,
    )


def stream_histogram_drift(
    stream: DataFrame,
    value_col: str,
    reference: DataFrame,
    state_dir: str,
    bin_width: int,
    checkpoint_dir: "str | None" = None,
    trigger_once: bool = True,
):
    """Streaming DRIFT monitoring: each micro-batch's integer values fold
    into a standing equi-width histogram on disk (constant state — the
    bin relation, never the rows), and the monitor emits the total-
    variation distance of the ACCUMULATED stream distribution vs a fixed
    ``reference`` histogram after every batch — 'is live traffic
    drifting from the training snapshot' as a stream job.

    Same algebra as ``profile.histogram_tv_drift`` (exact cross-
    multiplied integer L1, one final divide — libm-free), so
    stream-maintained and batch-recomputed TV are IDENTICAL: the
    stream==batch parity test pins it. State handling follows
    ``stream_cms``: only a genuinely missing state dir counts as first
    batch (transient FS errors re-raise and the micro-batch retries);
    the tiny bin relation is rewritten through collected rows so the
    read+overwrite of the same path is safe.

    Exactly-once fold: the standing histogram carries the id of the last
    batch folded into it (``last_batch_id``, constant across rows). A
    replayed micro-batch — retry after a failure between the histogram
    overwrite and the checkpoint commit — sees ``batch_id <=
    last_batch_id`` and skips the fold instead of double-counting; the
    TV row is written per-batch to ``_TV/batch_id=N`` with overwrite, so
    the replay rewrites (not duplicates) its row. This is the standard
    idempotent-by-batch_id foreachBatch pattern.

    The running TV lands in ``{state_dir}/_TV`` as one (batch_id,
    n_stream, n_ref, tv) row per batch — the alerting surface
    (``batch_id`` is the partition directory).

    Returns the StreamingQuery (caller awaits termination).
    """
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    if reference.isStreaming:
        raise ValueError(
            "reference must be a static (batch) relation — the training-"
            "time snapshot the live stream is compared against"
        )
    if dict(reference.dtypes).get(value_col) not in {
        "tinyint", "smallint", "int", "bigint"
    }:
        raise ValueError(
            f"stream_histogram_drift: {value_col!r} must be integer-typed "
            "— rescale upstream (cents, millis)"
        )
    import os as _os

    hist_dir = _os.path.join(state_dir, "hist")
    tv_dir = _os.path.join(state_dir, "_TV")

    ref_bins = (
        reference.select(
            F.floor(F.col(value_col) / bin_width).cast("bigint").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_ref_bin"))
    )

    def _fold(batch_df, batch_id):
        spark = batch_df.sparkSession
        batch_bins = (
            batch_df.select(
                F.floor(F.col(value_col) / bin_width)
                .cast("bigint")
                .alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        if _hadoop_path_exists(spark, hist_dir):
            standing = spark.read.parquet(hist_dir)
            applied = (
                standing.agg(F.max("last_batch_id")).collect()[0][0]
                if "last_batch_id" in standing.columns
                else None
            )
            if applied is not None and int(batch_id) <= int(applied):
                # replay of an already-folded batch (failure landed
                # between histogram overwrite and checkpoint commit):
                # the histogram already includes these rows — skip the
                # fold, just rewrite this batch's TV row below.
                merged_df = standing.select("bin", "n")
            else:
                merged = (
                    standing.select("bin", "n")
                    .unionByName(batch_bins)
                    .groupBy("bin")
                    .agg(F.sum("n").alias("n"))
                )
                rows = merged.collect()
                merged_df = spark.createDataFrame(rows, merged.schema)
                merged_df.withColumn(
                    "last_batch_id", F.lit(int(batch_id)).cast("bigint")
                ).coalesce(1).write.mode("overwrite").parquet(hist_dir)
        else:
            merged_df = batch_bins
            merged_df.withColumn(
                "last_batch_id", F.lit(int(batch_id)).cast("bigint")
            ).coalesce(1).write.mode("overwrite").parquet(hist_dir)

        joined = merged_df.join(ref_bins, "bin", "full_outer").select(
            F.coalesce(F.col("n"), F.lit(0)).alias("ns"),
            F.coalesce(F.col("n_ref_bin"), F.lit(0)).alias("nr"),
        )
        # two-pass: totals first (exact ints), then the cross-multiplied L1
        trow = joined.agg(
            F.sum("ns").alias("n_stream"), F.sum("nr").alias("n_ref")
        ).collect()[0]
        n_s, n_r = int(trow["n_stream"] or 0), int(trow["n_ref"] or 0)
        if n_s == 0 or n_r == 0:
            tv = None
        else:
            l1 = joined.agg(
                F.sum(
                    F.abs(
                        F.col("ns").cast("decimal(38,0)") * F.lit(n_r)
                        - F.col("nr").cast("decimal(38,0)") * F.lit(n_s)
                    )
                ).alias("l1")
            ).collect()[0]["l1"]
            tv = float(l1) / (2.0 * float(n_s) * float(n_r))
        # per-batch partition dir + overwrite: a replayed batch REWRITES
        # its row instead of appending a duplicate (idempotent)
        spark.createDataFrame(
            [(n_s, n_r, tv)],
            "n_stream LONG, n_ref LONG, tv DOUBLE",
        ).coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(tv_dir, f"batch_id={int(batch_id)}")
        )

    writer = stream.writeStream.foreachBatch(_fold).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_mixture_monitor(
    stream: DataFrame,
    source_col: str,
    token_count_col: str,
    weights: "dict[str, float]",
    budget_tokens: int,
    state_dir: str,
    checkpoint_dir: "str | None" = None,
    trigger_once: bool = True,
):
    """Streaming data-recipe monitor: each micro-batch's per-source
    (docs, tokens) fold into a standing counts table, and the monitor
    emits the live mixture-plan report — available vs desired tokens,
    fill rate, deficit per source — after every batch. 'Is the crawl
    filling the recipe, and which sources are short' as a stream job,
    the ingestion-time companion of ``sampling.mixture_plan``.

    The report is computed by the SAME expression half as the batch
    plan (``sampling.plan_from_counts``), so the stream-maintained
    report after batch N is bit-identical to ``mixture_plan`` over the
    union of batches 0..N — the stream == batch parity test pins it
    structurally.

    State handling follows ``stream_cms`` / ``stream_histogram_drift``:
    constant state (|sources| rows, never the documents), only a
    genuinely missing state dir counts as first batch, and the fold is
    idempotent-by-batch_id (a replayed micro-batch skips the fold and
    rewrites — not duplicates — its report partition at
    ``{state_dir}/_PLAN/batch_id=N``).

    Returns the StreamingQuery (caller awaits termination).
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    import os as _os

    from pangool_spark.operators.sampling import plan_from_counts

    counts_dir = _os.path.join(state_dir, "counts")
    plan_dir = _os.path.join(state_dir, "_PLAN")

    def _fold(batch_df, batch_id):
        spark = batch_df.sparkSession
        batch_counts = batch_df.groupBy(
            F.col(source_col).alias("source")
        ).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(token_count_col).cast("bigint")).alias(
                "avail_tokens"
            ),
        )
        if _hadoop_path_exists(spark, counts_dir):
            standing = spark.read.parquet(counts_dir)
            applied = (
                standing.agg(F.max("last_batch_id")).collect()[0][0]
                if "last_batch_id" in standing.columns
                else None
            )
            if applied is not None and int(batch_id) <= int(applied):
                # replay of an already-folded batch: state already
                # includes these rows — just rewrite the report below
                merged_df = standing.select(
                    "source", "n_docs", "avail_tokens"
                )
            else:
                merged = (
                    standing.select("source", "n_docs", "avail_tokens")
                    .unionByName(batch_counts)
                    .groupBy("source")
                    .agg(
                        F.sum("n_docs").alias("n_docs"),
                        F.sum("avail_tokens").alias("avail_tokens"),
                    )
                )
                rows = merged.collect()
                merged_df = spark.createDataFrame(rows, merged.schema)
                merged_df.withColumn(
                    "last_batch_id", F.lit(int(batch_id)).cast("bigint")
                ).coalesce(1).write.mode("overwrite").parquet(counts_dir)
        else:
            merged_df = batch_counts
            merged_df.withColumn(
                "last_batch_id", F.lit(int(batch_id)).cast("bigint")
            ).coalesce(1).write.mode("overwrite").parquet(counts_dir)

        report = plan_from_counts(merged_df, weights, budget_tokens)
        report.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(plan_dir, f"batch_id={int(batch_id)}")
        )

    writer = stream.writeStream.foreachBatch(_fold).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_heavy_hitters(
    stream: DataFrame,
    key_col: str,
    k: int,
    state_dir: str,
    checkpoint_dir: "str | None" = None,
    trigger_once: bool = True,
):
    """Streaming exact top-k: each micro-batch's per-key counts fold into
    a standing (key, count) table, and the monitor emits the live top-k
    snapshot (count desc, key asc tie-break) after every batch — "what
    are the hottest event types / sources / status codes right now"
    maintained incrementally instead of recomputed over history.

    EXACT counts need |keys| state, so this operator is for BOUNDED key
    domains (categories, languages, sources, error codes — the
    dashboards that actually want exact numbers); for unbounded domains
    (user ids, URLs) use ``stream_cms`` + ``sketch.cms_heavy_hitters``,
    which trade a bounded over-count for constant state. The standing
    table is collected-and-rewritten each batch (the
    ``stream_mixture_monitor`` small-state contract) — that collect IS
    the bounded-domain assumption, stated rather than hidden.

    Because the fold is plain integer addition, the snapshot after
    batch N is bit-identical to a batch groupBy-count + rank over the
    union of batches 0..N — the stream == batch parity test pins it.

    Exactly-once: the standing table carries ``last_batch_id``; a
    replayed micro-batch (retry after a failure between the state
    overwrite and the checkpoint commit) sees ``batch_id <=
    last_batch_id``, skips the fold, and only rewrites — not
    duplicates — its snapshot partition at
    ``{state_dir}/_TOPK/batch_id=N``.

    Returns the StreamingQuery (caller awaits termination).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    import os as _os

    from pyspark.sql import Window as _W

    counts_dir = _os.path.join(state_dir, "counts")
    topk_dir = _os.path.join(state_dir, "_TOPK")

    def _fold(batch_df, batch_id):
        spark = batch_df.sparkSession
        batch_counts = (
            batch_df.filter(F.col(key_col).isNotNull())
            .groupBy(F.col(key_col).alias("key"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        if _hadoop_path_exists(spark, counts_dir):
            standing = spark.read.parquet(counts_dir)
            applied = standing.agg(F.max("last_batch_id")).collect()[0][0]
            if applied is not None and int(batch_id) <= int(applied):
                # replay of an already-folded batch: skip the fold,
                # rewrite the snapshot below
                merged_df = standing.select("key", "cnt")
            else:
                merged = (
                    standing.select("key", "cnt")
                    .unionByName(batch_counts)
                    .groupBy("key")
                    .agg(F.sum("cnt").alias("cnt"))
                )
                rows = merged.collect()  # bounded-domain contract
                merged_df = spark.createDataFrame(rows, merged.schema)
                merged_df.withColumn(
                    "last_batch_id", F.lit(int(batch_id)).cast("bigint")
                ).coalesce(1).write.mode("overwrite").parquet(counts_dir)
        else:
            merged_df = batch_counts
            merged_df.withColumn(
                "last_batch_id", F.lit(int(batch_id)).cast("bigint")
            ).coalesce(1).write.mode("overwrite").parquet(counts_dir)

        w = _W.orderBy(F.desc("cnt"), F.asc("key"))
        snapshot = (
            merged_df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("rank", "key", "cnt")
        )
        snapshot.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(topk_dir, f"batch_id={int(batch_id)}")
        )

    writer = stream.writeStream.foreachBatch(_fold).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_unigram_drift(
    stream: DataFrame,
    text_col: str,
    reference: DataFrame,
    state_dir: str,
    checkpoint_dir: "str | None" = None,
    trigger_once: bool = True,
    quantum: int = 1_000_000_000,
):
    """Streaming LEXICAL drift: each micro-batch's token counts fold into
    a standing vocabulary-count table, and the monitor emits the add-1-
    smoothed unigram KL divergence (both directions) of the ACCUMULATED
    stream distribution vs a fixed ``reference`` corpus after every
    batch — "is the live crawl's token mix walking away from the
    training snapshot", the streaming twin of ``infotheory.unigram_kl``
    (same cross-ratio + quantized-term algebra, so stream-maintained
    and batch-recomputed KL are bit-identical — the parity test pins
    it).

    State is the |vocab|-row count relation — too big for the
    collect-and-rewrite small-state pattern (``stream_cms`` grids), so
    versioning replaces collection: batch N writes
    ``{state_dir}/counts/v{N}`` distributively, reads the previous
    version, and best-effort deletes ``v{N-2}``. A replayed micro-batch
    finds its own version already present (``batch_id <= last``) and
    skips the fold (idempotent-by-batch_id); only a genuinely missing
    state dir counts as first batch. KL rows land at
    ``{state_dir}/_KL/batch_id=N``.

    Returns the StreamingQuery (caller awaits termination).
    """
    import os as _os

    ref_counts = (
        reference.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
                "__tok__"
            )
        )
        .filter(F.col("__tok__") != "")
        .groupBy("__tok__")
        .agg(F.count(F.lit(1)).alias("__cq__"))
    )

    counts_root = _os.path.join(state_dir, "counts")
    kl_dir = _os.path.join(state_dir, "_KL")

    def _versions(spark):
        if not _hadoop_path_exists(spark, counts_root):
            return []
        hpath = spark._jvm.org.apache.hadoop.fs.Path(counts_root)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        out = []
        for st in fs.listStatus(hpath):
            name = st.getPath().getName()
            if name.startswith("v") and name[1:].isdigit():
                out.append(int(name[1:]))
        return sorted(out)

    def _fold(batch_df, batch_id):
        spark = batch_df.sparkSession
        bid = int(batch_id)
        batch_counts = (
            batch_df.select(
                F.explode(
                    F.split(F.lower(F.col(text_col)), r"\s+")
                ).alias("__tok__")
            )
            .filter(F.col("__tok__") != "")
            .groupBy("__tok__")
            .agg(F.count(F.lit(1)).alias("__cp__"))
        )
        versions = _versions(spark)
        if versions and bid <= versions[-1]:
            merged = spark.read.parquet(
                _os.path.join(counts_root, f"v{versions[-1]}")
            )  # replay: fold already applied — rewrite the KL row only
        else:
            if versions:
                standing = spark.read.parquet(
                    _os.path.join(counts_root, f"v{versions[-1]}")
                )
                merged_new = (
                    standing.unionByName(batch_counts)
                    .groupBy("__tok__")
                    .agg(F.sum("__cp__").alias("__cp__"))
                )
            else:
                merged_new = batch_counts
            merged_new.write.mode("overwrite").parquet(
                _os.path.join(counts_root, f"v{bid}")
            )
            merged = spark.read.parquet(
                _os.path.join(counts_root, f"v{bid}")
            )
            # best-effort cleanup of versions older than the previous one
            for old in versions[:-1]:
                try:
                    p = spark._jvm.org.apache.hadoop.fs.Path(
                        _os.path.join(counts_root, f"v{old}")
                    )
                    p.getFileSystem(
                        spark._jsc.hadoopConfiguration()
                    ).delete(p, True)
                except Exception:
                    pass  # cleanup must never fail the batch

        # KL via the SAME algebra as infotheory.unigram_kl, fed with the
        # standing counts: unigram_kl explodes raw text, so its exact
        # expression chain is inlined here over the pre-aggregated
        # counts (identical expressions, pinned by the parity test):
        vocab = merged.join(ref_counts, "__tok__", "full_outer").select(
            F.coalesce("__cp__", F.lit(0)).alias("__cp__"),
            F.coalesce("__cq__", F.lit(0)).alias("__cq__"),
        )
        totals = F.broadcast(
            vocab.agg(
                F.count(F.lit(1)).alias("vocab"),
                F.sum("__cp__").alias("n_p"),
                F.sum("__cq__").alias("n_q"),
            )
        )
        joined = vocab.crossJoin(totals)
        dp = (F.col("n_p") + F.col("vocab")).cast("double")
        dq = (F.col("n_q") + F.col("vocab")).cast("double")
        ap = (F.col("__cp__") + F.lit(1)).cast("double")
        aq = (F.col("__cq__") + F.lit(1)).cast("double")
        lnratio = F.log((ap * dq) / (aq * dp))
        q = F.lit(float(quantum))
        qsum = lambda c: (  # noqa: E731
            F.sum(F.round(c * q).cast("decimal(38,0)")).cast("double")
        )
        kl = (
            joined.groupBy("vocab", "n_p", "n_q")
            .agg(
                qsum((ap / dp) * lnratio).alias("__skl_pq__"),
                qsum((aq / dq) * (-lnratio)).alias("__skl_qp__"),
            )
            .select(
                F.lit(bid).cast("bigint").alias("batch_id"),
                "vocab",
                "n_p",
                "n_q",
                (F.col("__skl_pq__") / q).alias("kl_pq"),
                (F.col("__skl_qp__") / q).alias("kl_qp"),
            )
        )
        kl.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(kl_dir, f"batch_id={bid}")
        )

    writer = stream.writeStream.foreachBatch(_fold).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_quantile_sketch(
    stream: DataFrame,
    value_col: str,
    state_dir: str,
    bin_width: int,
    quantiles: "tuple[float, ...]" = (0.5, 0.95, 0.99),
    checkpoint_dir: "str | None" = None,
    trigger_once: bool = True,
):
    """Streaming quantile monitoring: each micro-batch's integer values
    fold into a standing equi-width histogram on disk (constant state —
    the bin relation, never the rows), and after every batch the monitor
    emits the ACCUMULATED stream's quantile brackets — "what are live
    P50/P95/P99 so far" with the hard one-bin error bound of
    ``sketch.histogram_quantile_sketch``.

    The per-batch report is computed by calling ``sketch.quantiles_
    from_bins`` on the standing bin relation — the SAME expressions the
    batch operator runs, so stream-maintained and batch-recomputed
    quantiles are IDENTICAL by construction (the parity test pins it per
    prefix). State handling and exactly-once follow
    ``stream_histogram_drift``: only a genuinely missing state dir
    counts as first batch; the standing histogram carries
    ``last_batch_id`` and a replayed micro-batch (retry after a failure
    between the histogram overwrite and the checkpoint commit) skips the
    fold instead of double-counting; the quantile rows land in
    ``{state_dir}/_Q/batch_id=N`` with overwrite, so a replay rewrites
    (not duplicates) its report.

    Returns the StreamingQuery (caller awaits termination).
    """
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    if not quantiles or not all(0.0 < q <= 1.0 for q in quantiles):
        raise ValueError(f"quantiles must be in (0, 1], got {quantiles!r}")
    if dict(stream.dtypes).get(value_col) not in {
        "tinyint", "smallint", "int", "bigint"
    }:
        raise ValueError(
            f"stream_quantile_sketch: {value_col!r} must be integer-typed "
            "— rescale upstream (cents, millis)"
        )
    import os as _os

    from pangool_spark.operators.sketch import quantiles_from_bins

    w = int(bin_width)
    qs = tuple(float(q) for q in quantiles)
    hist_dir = _os.path.join(state_dir, "hist")
    q_dir = _os.path.join(state_dir, "_Q")

    def _fold(batch_df, batch_id):
        spark = batch_df.sparkSession
        batch_bins = (
            batch_df.filter(F.col(value_col).isNotNull())
            .select(
                F.floor(F.col(value_col).cast("bigint") / F.lit(w))
                .cast("bigint")
                .alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        if _hadoop_path_exists(spark, hist_dir):
            standing = spark.read.parquet(hist_dir)
            applied = standing.agg(F.max("last_batch_id")).collect()[0][0]
            if applied is not None and int(batch_id) <= int(applied):
                # replay of an already-folded batch: the histogram
                # already includes these rows — skip the fold, just
                # rewrite this batch's quantile report below.
                merged_df = standing.select("bin", "cnt")
            else:
                merged = (
                    standing.select("bin", "cnt")
                    .unionByName(batch_bins)
                    .groupBy("bin")
                    .agg(F.sum("cnt").alias("cnt"))
                )
                rows = merged.collect()
                merged_df = spark.createDataFrame(rows, merged.schema)
                merged_df.withColumn(
                    "last_batch_id", F.lit(int(batch_id)).cast("bigint")
                ).coalesce(1).write.mode("overwrite").parquet(hist_dir)
        else:
            merged_df = batch_bins
            merged_df.withColumn(
                "last_batch_id", F.lit(int(batch_id)).cast("bigint")
            ).coalesce(1).write.mode("overwrite").parquet(hist_dir)

        # per-batch partition dir + overwrite: a replayed batch REWRITES
        # its report instead of appending a duplicate (idempotent)
        quantiles_from_bins(spark, merged_df, w, qs).coalesce(1).write.mode(
            "overwrite"
        ).parquet(_os.path.join(q_dir, f"batch_id={int(batch_id)}"))

    writer = stream.writeStream.foreachBatch(_fold).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_confusion_monitor(
    stream: DataFrame,
    label_col: str,
    pred_col: str,
    state_dir: str,
    checkpoint_dir: "str | None" = None,
    trigger_once: bool = True,
):
    """Streaming model-quality monitor: each micro-batch's (label,
    prediction) pairs fold into a standing confusion-cell table and the
    monitor emits the live classification report — per-class
    precision/recall/F1, accuracy, macro-F1, MCC — after every batch.
    'Is the deployed classifier drifting' as a stream job, the
    label-feedback companion of ``stream_histogram_drift``'s feature
    view.

    The report is computed by the SAME expression half as the batch
    operator (``ml.confusion_report_from_cells``), so the
    stream-maintained report after batch N is bit-identical to
    ``classification_report`` over the union of batches 0..N — the
    stream == batch parity test pins it structurally.

    State handling follows ``stream_mixture_monitor``: constant state
    (≤C² cell rows, never the events), only a genuinely missing state
    dir counts as first batch, the fold is idempotent-by-batch_id (a
    replayed micro-batch skips the fold and rewrites — not duplicates —
    its report partition at ``{state_dir}/_REPORT/batch_id=N``; batch
    ids are only genuine replays when a ``checkpoint_dir`` is set — a
    checkpoint-less re-run renumbers from 0, so NEW files in that run
    are skipped as replays too; pass a checkpoint in production), and
    NULL labels/predictions are dropped (the batch operator's
    contract).

    Returns the StreamingQuery (caller awaits termination).
    """
    import os as _os

    from pangool_spark.operators.ml import confusion_report_from_cells

    cells_dir = _os.path.join(state_dir, "cells")
    report_dir = _os.path.join(state_dir, "_REPORT")

    def _fold(batch_df, batch_id):
        spark = batch_df.sparkSession
        batch_cells = (
            batch_df.filter(
                F.col(label_col).isNotNull() & F.col(pred_col).isNotNull()
            )
            .groupBy(
                F.col(label_col).alias("label"),
                F.col(pred_col).alias("pred"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )
        if _hadoop_path_exists(spark, cells_dir):
            standing = spark.read.parquet(cells_dir)
            applied = (
                standing.agg(F.max("last_batch_id")).collect()[0][0]
                if "last_batch_id" in standing.columns
                else None
            )
            if applied is not None and int(batch_id) <= int(applied):
                # replay of an already-folded batch: state already
                # includes these rows — just rewrite the report below
                merged_df = standing.select("label", "pred", "n")
            else:
                merged = (
                    standing.select("label", "pred", "n")
                    .unionByName(batch_cells)
                    .groupBy("label", "pred")
                    .agg(F.sum("n").alias("n"))
                )
                rows = merged.collect()
                merged_df = spark.createDataFrame(rows, merged.schema)
                merged_df.withColumn(
                    "last_batch_id", F.lit(int(batch_id)).cast("bigint")
                ).coalesce(1).write.mode("overwrite").parquet(cells_dir)
        else:
            merged_df = batch_cells
            merged_df.withColumn(
                "last_batch_id", F.lit(int(batch_id)).cast("bigint")
            ).coalesce(1).write.mode("overwrite").parquet(cells_dir)

        report = confusion_report_from_cells(
            merged_df, "label", "pred", "n"
        )
        report.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(report_dir, f"batch_id={int(batch_id)}")
        )

    writer = stream.writeStream.foreachBatch(_fold).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
