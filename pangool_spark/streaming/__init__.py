"""Structured Streaming over the same operators.

The reference has NO streaming (SURVEY §2.11 — pure batch MapReduce). This
module is the Spark-first extension: the engine's grouped aggregates run
incrementally over a stream with watermarked event-time windows, and custom
stateful reducers land on ``applyInPandasWithState``.
"""

from pangool_spark.streaming.ops import (
    read_stream,
    windowed_agg,
    sessionize,
    stream_dedup,
    stateful_running_totals,
    stream_ewma,
    stream_outliers,
)
from pangool_spark.streaming.joins import (
    stream_static_join,
    stream_stream_join,
    foreach_batch_sink,
)

__all__ = [
    "read_stream",
    "windowed_agg",
    "sessionize",
    "stream_dedup",
    "stateful_running_totals",
    "stream_ewma",
    "stream_outliers",
    "stream_static_join",
    "stream_stream_join",
    "foreach_batch_sink",
]
