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
    ap.add_argument(
        "--warmup",
        action="store_true",
        help="run a fixed warmup set (untimed) before the timed queries. "
        "A fresh JVM runs its first queries 3-10x slower while C2 compiles "
        "the codegen/shuffle infrastructure (measured: the FIRST profiled "
        "query settles 61s->33s->19s across runs while the same query "
        "profiled late in a warm session is stable at ~6s) — so per-query "
        "A/Bs from a cold session compare JIT states, not plans. bench.py "
        "runs the whole catalog in one session, so its extended entries "
        "are warm-JVM numbers; this flag reproduces that regime.",
    )
    args = ap.parse_args()

    from pangool_spark.session import get_spark
    from pangool_spark.queries import QUERIES, clear_shingle_cache

    spark = get_spark("profile_query")
    # warm JVM + parquet footers so run 1 isn't all session startup
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    if args.warmup:
        # One exchange-heavy join/agg query, one HOF/explode query, one
        # window query: between them they touch every codegen template the
        # catalog leans on, so the timed queries below start from the same
        # JIT state bench.py's extended section runs in.
        for wname in ("q3_top_revenue_orders", "wordcount", "topk_orders_per_cust"):
            spark.catalog.clearCache()
            clear_shingle_cache(spark)
            spark.sparkContext.setJobDescription(f"warmup {wname}")
            for _ in range(2):
                QUERIES[wname](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()

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
