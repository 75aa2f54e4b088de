"""Graph helpers for dedup clustering: connected components via label
propagation.

No reference counterpart (Pangool chains MapReduce jobs for iteration —
``EX/gameoflife``); Spark-first shape: each round is one join + one
aggregate, lineage truncated per round by ``plans.iterate``'s
localCheckpoint discipline. Converges in O(diameter) rounds; duplicate
clusters have tiny diameters in practice, so ``max_iterations`` defaults
low and convergence is checked with a cheap count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Label propagation: every vertex adopts the minimum label among itself
    and its neighbors until fixpoint. Output: (vertex, component) where
    component = min vertex id in the component.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iterations`` — a truncated propagation would silently split
    components (rounds needed = graph diameter; 50 covers any realistic
    duplicate-cluster chain).
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    labels = (
        sym.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.v == labels.vertex)
            .groupBy(F.col("u").alias("vertex"))
            .agg(F.min("component").alias("n_min"))
        )
        updated = (
            labels.join(neighbor_min, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce(F.col("n_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds "
            f"({changed} labels still changing); raise max_iterations"
        )
    return labels


def cluster_representatives(components: DataFrame) -> DataFrame:
    """(vertex, component) → surviving vertex per cluster (the component
    id itself, which is the min member)."""
    return components.select(F.col("component").alias("vertex")).distinct()
