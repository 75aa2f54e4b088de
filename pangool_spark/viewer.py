"""Tuple-file viewer utility.

Ref ``EX/TupleViewer.java:25-34``: dump a tuple file's schema and contents
for debugging. Two paths:

- ``view_tuples(spark, path)`` — Spark-first: reads through
  ``read_tuples`` (sidecar schemas, evolution, globbing all apply) and
  returns formatted lines.
- ``view_tuples(path)`` / the CLI — pyarrow footer-only fast path: no JVM,
  answers in milliseconds like the reference's local reader (spinning up a
  Spark session to eyeball ten rows is the wrong tool).
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def view_tuples(
    spark_or_path: "SparkSession | str",
    path: str | None = None,
    limit: int = 20,
    truncate: int = 60,
) -> str:
    """Render schema + up to ``limit`` rows of a tuple file as text.

    Pass ``(spark, path)`` for the Spark read (evolution-aware), or just
    ``(path)`` for the sessionless pyarrow fast path.
    """
    if isinstance(spark_or_path, str):
        return _view_tuples_arrow(spark_or_path, limit)
    from pangool_spark.sources.tuplefile import read_tuples

    df = read_tuples(spark_or_path, path)
    header = df.schema.simpleString()
    body = df._show_string(limit, truncate, False)
    return f"{path}\n{header}\n{body}"


def _view_tuples_arrow(path: str, n: int) -> str:
    import glob as _glob

    import pyarrow.dataset as ds

    # pyarrow does not expand globs, but the Spark path always did (and the
    # CLI advertises it) — expand here so `viewer '/data/part-*.parquet'`
    # keeps working
    source: "str | list[str]" = path
    if any(ch in path for ch in "*?["):
        matches = sorted(_glob.glob(path))
        if not matches:
            raise FileNotFoundError(f"no files match {path}")
        source = matches
    dataset = ds.dataset(source, format="parquet")
    schema = dataset.schema
    lines = [f"schema ({len(schema)} fields):"]
    for field in schema:
        nullable = "?" if field.nullable else ""
        lines.append(f"  {field.name}: {field.type}{nullable}")
    rows = dataset.head(n).to_pylist()
    lines.append(f"first {n} rows of {path}:")
    if not rows:
        lines.append("  (empty)")
    for row in rows:
        lines.append("  " + ", ".join(f"{k}={v!r}" for k, v in row.items()))
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    if not args:
        print("usage: python -m pangool_spark.viewer <path> [limit]", file=sys.stderr)
        return 2
    n = int(args[1]) if len(args) > 1 else 20
    print(view_tuples(args[0], limit=n))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
