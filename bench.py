"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family — grouped agg, multi-join+topk,
# window, rollup, general reducer, join-agg, dedup (exact + LSH), knn, text.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q10_returned_items",
    "customer_order_stats",
    "topk_orders_per_cust",
    "moving_avg_events",
    "rollup_lineitem",
    "rollup_callbacks",
    "secondary_sort_orders",
    "embedding_cosine_dups",
    "wordcount",
    "dedup_exact_docs",
    "near_dedup_survivors",
    "minhash_lsh_dedup",
    "knn_bruteforce",
    "lsh_cosine_pairs",
    "token_stats_docs",
    "windowed_agg_events",
    "sessionize_events",
    "salted_agg_events",
    "interval_join_events",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pangool_spark.session import get_spark
    from pangool_spark.queries import QUERIES

    spark = get_spark("pangool_spark_bench")

    # Warm the JVM + parquet footers once so timings measure the queries.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best, n = float("inf"), 0
        # best-of-2: the second run reuses compiled codegen classes, so this
        # measures steady-state query time rather than one-off JIT noise.
        # clearCache keeps one query's materialized intermediates from
        # occupying storage during the next query's runs.
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {n} rows in {timings[name]:.2f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
