"""Streaming joins + foreachBatch sink (extension; SURVEY §2.11).

Stream-static joins are stateless per micro-batch (the static side is
re-planned each trigger — dimension updates are picked up); stream-stream
joins buffer both sides in the state store, so BOTH the watermark and an
event-time range constraint are mandatory here — without them state grows
unboundedly, exactly the failure mode a 100 TB stream cannot afford.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_static_join(
    stream: DataFrame,
    static: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
    broadcast_static: bool = True,
) -> DataFrame:
    """Join a stream against a static dimension table.

    Stateless: each micro-batch joins against the CURRENT static relation.
    ``broadcast_static`` hints the planner to ship the dim to executors once
    per trigger instead of shuffling the stream (right for dimension-sized
    tables; disable for large static sides so SMJ/shuffle-hash applies).
    Left/inner supported on the stream side (Spark's rule: outer joins that
    would need to wait for static rows are not meaningful).
    """
    if static.isStreaming:
        raise ValueError("static side must not be a streaming DataFrame")
    right = F.broadcast(static) if broadcast_static else static
    return stream.join(right, on=on, how=how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    within: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with bounded state.

    Both sides get an event-time watermark and the join carries the range
    constraint ``right_ts ∈ [left_ts - within, left_ts + within]`` — the two
    conditions Spark needs to know when a buffered row can never match again
    and evict it. Join keys ``on`` are equality columns present on both
    sides; the timestamp columns stay distinct so the range predicate can
    reference both.

    State at scale: O(rows within the watermark horizon) per side, hash-
    partitioned by join key — sizing the horizon IS sizing the state store.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    # Alias both sides so every predicate references an unambiguous plan
    # subtree — unaliased `lw[k] == rw[k]` trips Spark's "trivially true
    # equals" self-join heuristics when both sides derive from one source.
    la, ra = lw.alias("__sjl__"), rw.alias("__sjr__")
    cond = None
    for k in on:
        c = F.col(f"__sjl__.`{k}`") == F.col(f"__sjr__.`{k}`")
        cond = c if cond is None else cond & c
    lts, rts = F.col(f"__sjl__.`{left_ts}`"), F.col(f"__sjr__.`{right_ts}`")
    lo = rts >= lts - F.expr(f"INTERVAL {within}")
    hi = rts <= lts + F.expr(f"INTERVAL {within}")
    joined = la.join(ra, cond & lo & hi, how=how)
    # drop the duplicated equality key columns from the right side
    return joined.drop(*[F.col(f"__sjr__.`{k}`") for k in on])


def foreach_batch_sink(
    stream: DataFrame,
    send_batch: Callable,
    make_client: Callable = lambda: None,
    close_client: Callable = lambda c: None,
    batch_size: int = 1000,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
    query_name: str = "foreach_batch_sink",
):
    """Micro-batch bridge to the batch ``external_sink`` pattern
    (TupleSolrOutputFormat / Mongo-sink parity for streams,
    P/solr/TupleSolrOutputFormat.java:46-109): every micro-batch is pushed
    through the same per-partition batching writer, so ONE sink
    implementation serves batch and streaming.

    Delivery semantics: AT-LEAST-ONCE — a micro-batch that fails after
    some partitions sent is retried whole, so ``send_batch`` must be
    idempotent at the receiver (upsert by document id, the Solr/Mongo
    norm) for exactly-once effects. State-folding streams that own their
    sink (``stream_cms``, ``stream_upsert``, ``stream_histogram_drift``)
    get exactly-once via the idempotent-by-batch_id pattern instead.

    Returns the started StreamingQuery (caller awaits/stops it).
    """
    from pangool_spark.sources.external import external_sink

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        external_sink(
            batch_df,
            send_batch,
            make_client=make_client,
            close_client=close_client,
            batch_size=batch_size,
        )

    writer = stream.writeStream.foreachBatch(handle).queryName(query_name)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
