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
    # Materialize the symmetrized edge list ONCE: every round joins against
    # it, and without the checkpoint each round re-executes the caller's
    # full pair-generation lineage — twice, since the union reads `edges`
    # two ways. (The pair pipelines feeding this are inverted-index joins;
    # re-running one per round turned a 2-round propagation into the
    # dominant cost of near_dedup_clusters.)
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint(eager=True)
    )

    # Labels are non-increasing (every update is a min), so the label SUM
    # strictly decreases until the fixpoint: comparing one scalar per round
    # replaces the old change-count join (2 joins + a count job per round
    # → 1 join + 1 aggregate). Decimal sum: 10^9 vertices × 10^18 ids
    # overflows int64, and a silent wrap would fake convergence.
    def label_sum(df: DataFrame):
        return df.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = label_sum(labels)
    converged = False
    for _ in range(max_iterations):
        # each neighbor contributes its label to vertex u; the vertex's own
        # label rides along via the union, so one min-aggregate computes
        # least(self, min(neighbors)) without a second join
        contributions = sym.join(labels, sym.v == labels.vertex).select(
            F.col("u").alias("vertex"), "component"
        )
        labels = (
            contributions.unionByName(labels.select("vertex", "component"))
            .groupBy("vertex")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        new_sum = label_sum(labels)
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds; "
            "raise max_iterations"
        )
    return labels


def cluster_representatives(components: DataFrame) -> DataFrame:
    """(vertex, component) → surviving vertex per cluster (the component
    id itself, which is the min member)."""
    return components.select(F.col("component").alias("vertex")).distinct()
