"""Per-query profiler for the optimization rounds.

Times each named query with the noop sink (guide §1.4 — computes every
column of every row, no sink cost, no count-path column pruning) and
writes its ``explain("formatted")`` to ``plans/<tag>/<name>_<suffix>.txt``.

Usage:
    python tools/profile_query.py [--sf DIR] [--runs N] [--tag r11] \
        [--suffix before|after] query [query ...]

Prints one line per query: name, best-of-N seconds, run seconds.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default="r11")
    ap.add_argument("--suffix", default=None, help="write plan file with this suffix")
    args = ap.parse_args()

    from pangool_spark.session import get_spark
    from pangool_spark.queries import QUERIES, clear_shingle_cache

    spark = get_spark("profile_query")
    # warm JVM + parquet footers so run 1 isn't all session startup
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(plan_dir, exist_ok=True)

    for name in args.queries:
        fn = QUERIES[name]
        times = []
        for i in range(args.runs):
            spark.catalog.clearCache()
            clear_shingle_cache(spark)
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        if args.suffix:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plan_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        print(
            f"{name}: best {min(times):.3f}s  runs "
            + " ".join(f"{t:.3f}" for t in times),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
