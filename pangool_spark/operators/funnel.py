"""Funnel analysis: per-key furthest-step-reached over an ordered event
sequence (view → click → purchase, signup → activate → pay, ...).

No reference counterpart (the closest shape is a secondary-sorted reducer
walking a user's events — ``P/tuplemr`` group + order-by); Spark-first:
filter to the funnel's event types and compute the greedy subsequence
match with pure JVM expressions — no Python anywhere.

Greedy subsequence matching (advance the step cursor at the first
qualifying event) is optimal for "is step-prefix k embeddable in order",
so both modes compute exactly `max k: steps[0..k) occur in order`.

Two execution modes:

- ``stepwise`` (default): the greedy match times are DETERMINISTIC —
  t_0 = min ts of step-0 events, t_k = min ts of step-k events at-or-after
  t_{k-1} (ties at one timestamp resolve earlier-step-first, hence the
  at-or-after) — so the whole funnel is len(steps) conditional
  min-aggregates chained on the key. Per-key state is ONE timestamp per
  aggregate (map-side partial_min), so a bot key with millions of
  qualifying events costs CPU, never task memory; each step's scan
  pushes its event-type filter down. The chained levels fan out in the
  lineage (level k feeds both level k+1 and the final depth join), and
  Spark's exchange reuse recovers only part of it — fine at typical 3-5
  step funnels, quadratic-in-steps scans for wide ones, where
  ``checkpoint_levels=True`` materializes each level once instead.
- ``fold``: ONE shuffle groups each key's funnel events, and an
  ``F.aggregate`` expression folds the time-sorted sequence. Fewer
  exchanges, but the per-key ``collect_list`` holds ALL of that key's
  funnel events in task memory — bounded only by per-key funnel-event
  cardinality, which an adversarial/bot key can blow. Use when keys are
  trusted-bounded and exchange count dominates.
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
    mode: str = "stepwise",
    checkpoint_levels: bool = False,
) -> DataFrame:
    """Per-key funnel depth: (key, steps_completed) where steps_completed
    is the longest prefix of ``steps`` occurring in timestamp order.
    Keys with no funnel events are absent (depth-0 by omission). Ties at
    one timestamp resolve in step order (earlier step first), keeping the
    result total and engine-replicable. Both modes return identical
    results (pinned by property test); they differ only in the memory /
    exchange trade described in the module docstring.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct")
    if mode not in ("stepwise", "fold"):
        raise ValueError(f"unknown mode {mode!r}: stepwise|fold")
    idx = F.lit(None)
    for i, s in reversed(list(enumerate(steps))):
        idx = F.when(F.col(type_col) == s, F.lit(i)).otherwise(idx)
    # events without a timestamp have no position in the order — ignore
    # them EXPLICITLY so both modes agree (the fold would sort nulls
    # first, the stepwise min-chain would never match them)
    ev = events.filter(
        F.col(type_col).isin(list(steps)) & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col),
        idx.cast("int").alias("__idx__"),
        F.col(ts_col).alias("__ts__"),
    )
    if mode == "fold":
        seq = (
            ev.select(
                key_col,
                F.struct(
                    F.col("__ts__").alias("ts"), F.col("__idx__").alias("idx")
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

    # stepwise: t_k = min ts of step-k events with ts >= t_{k-1}
    all_keys = ev.select(key_col).distinct()
    flags = []
    cur: DataFrame | None = None
    for k in range(len(steps)):
        ev_k = ev.filter(F.col("__idx__") == k)
        if cur is None:
            cand = ev_k
        else:
            cand = ev_k.join(cur, key_col).filter(
                F.col("__ts__") >= F.col("__t__")
            )
        cur = cand.groupBy(key_col).agg(F.min("__ts__").alias("__t__"))
        if checkpoint_levels:
            # materialize the level once: kills the lineage fan-out
            # (each level feeds the next level AND the depth join) for
            # wide funnels at the cost of eager per-level jobs
            cur = cur.localCheckpoint(eager=True)
        flags.append(cur.select(key_col, F.lit(True).alias(f"__m{k}__")))
    out = all_keys
    for fl in flags:
        out = out.join(fl, key_col, "left")
    # matched-key sets are nested (step k implies step k-1), so the
    # highest set bit is the depth; built ascending, each when() wraps the
    # previous as its otherwise → outermost test is the deepest step
    depth = F.lit(0)
    for k in range(len(steps)):
        depth = F.when(F.col(f"__m{k}__"), F.lit(k + 1)).otherwise(depth)
    return out.select(F.col(key_col), depth.cast("int").alias("steps_completed"))
