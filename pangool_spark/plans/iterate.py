"""Iterative pipelines (the Game-of-Life pattern).

Ref ``EX/gameoflife/GameOfLifeJob.java:62-109``: the reference chains N
MapReduce jobs, each reading the previous job's output files. Spark-first:
keep the loop in the driver, localCheckpoint each iteration to truncate
lineage (otherwise the plan doubles per step and the job eventually dies in
the optimizer), and unpersist the previous step's blocks.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def iterate(
    df: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    n_iterations: int,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Apply ``step(df, i)`` ``n_iterations`` times with lineage truncation.

    ``checkpoint_every`` trades lineage length against checkpoint cost —
    at 100 TB an eager localCheckpoint per step is usually right because the
    alternative is a plan tree that grows exponentially with joins inside
    ``step``.
    """
    current = df
    previous = None
    for i in range(n_iterations):
        current = step(current, i)
        if (i + 1) % checkpoint_every == 0 or i == n_iterations - 1:
            current = current.localCheckpoint(eager=True)
            if previous is not None:
                previous.unpersist()
            previous = current
    return current
