"""Tuple-file viewer utility.

Ref ``EX/TupleViewer.java:25-34``: dump a tuple file's schema and contents
for debugging. Spark-first: reads through ``read_tuples`` (so sidecar
schemas, evolution, and globbing all apply) and returns formatted lines
instead of printing, so it is scriptable and testable.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pangool_spark.sources.tuplefile import read_tuples


def view_tuples(
    spark: SparkSession, path: str, limit: int = 20, truncate: int = 60
) -> str:
    """Render schema + up to ``limit`` rows of a tuple file as text."""
    df = read_tuples(spark, path)
    header = df.schema.simpleString()
    body = df._show_string(limit, truncate, False)
    return f"{path}\n{header}\n{body}"


def main() -> None:  # pragma: no cover - thin CLI
    import sys

    from pangool_spark.session import get_spark

    if len(sys.argv) < 2:
        raise SystemExit("usage: python -m pangool_spark.viewer <path> [limit]")
    spark = get_spark("tuple_viewer")
    print(view_tuples(spark, sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 20))


if __name__ == "__main__":
    main()
