"""Funnel analysis: per-key furthest-step-reached over an ordered event
sequence (view → click → purchase, signup → activate → pay, ...).

No reference counterpart (the closest shape is a secondary-sorted reducer
walking a user's events — ``P/tuplemr`` group + order-by); Spark-first:
filter to the funnel's event types, ONE shuffle to group by key, and a
fold over the time-sorted per-key sequence with ``F.aggregate`` — pure
JVM expressions, no Python, no window over the full event stream.

Greedy subsequence matching (advance the step cursor at the first
qualifying event) is optimal for "is step-prefix k embeddable in order",
so the fold computes exactly `max k: steps[0..k) occur in order`.

Scale contract: the per-key collected sequence holds only FUNNEL events
for that key (not the key's whole history); memory per key is bounded by
funnel-event cardinality, the usual assumption of funnel engines.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-key funnel depth: (key, steps_completed) where steps_completed
    is the longest prefix of ``steps`` occurring in timestamp order.
    Keys with no funnel events are absent (depth-0 by omission). Ties at
    one timestamp resolve in step order (earlier step first), keeping the
    result total and engine-replicable.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct")
    idx = F.lit(None)
    for i, s in reversed(list(enumerate(steps))):
        idx = F.when(F.col(type_col) == s, F.lit(i)).otherwise(idx)
    seq = (
        events.filter(F.col(type_col).isin(list(steps)))
        .select(
            F.col(key_col),
            F.struct(
                F.col(ts_col).alias("ts"), idx.cast("int").alias("idx")
            ).alias("__e__"),
        )
        .groupBy(key_col)
        .agg(F.sort_array(F.collect_list("__e__")).alias("__seq__"))
    )
    completed = F.aggregate(
        "__seq__",
        F.lit(0),
        lambda acc, e: F.when(e["idx"] == acc, acc + F.lit(1)).otherwise(acc),
    )
    return seq.select(
        F.col(key_col), completed.cast("int").alias("steps_completed")
    )
