"""Time a set of catalog queries at an arbitrary sf dir — the scale-probe
companion to bench.py (which is pinned to the frozen headline sets).
Default target is the synthesized 10×-bench-scale dir from
tools/make_sf_scale.py; default query list is the most expensive catalog
shapes, where blocking quality and candidate volumes actually show.

Usage: python tools/scale_probe.py [sf_dir] [query ...]
Prints one JSON line {query: {sec, rows}, ...} plus a total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "secondary_sort_orders",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "minhash_lsh_dedup",
    "near_dedup_survivors",
    "simhash_dedup",
    "embedding_cosine_dups",
    "semantic_dedup_embeddings",
    "incremental_dedup_batch",
    "lm_perplexity_docs",
    "curation_pipeline",
    "training_prep_pipeline",
    "dedup_index_lifecycle",
    "fuzzy_join_new_parts",
    "pagerank_supplier_part",
    "triangle_count_parts",
    "line_dedup_docs",
    "naive_bayes_docs",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    names = sys.argv[2:] or DEFAULT_QUERIES

    from pangool_spark.queries import QUERIES, clear_shingle_cache
    from pangool_spark.session import get_spark

    spark = get_spark("scale_probe")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm JVM

    out: dict[str, dict] = {}
    for name in names:
        spark.catalog.clearCache()
        t0 = time.time()
        n = QUERIES[name](spark, sf_dir).count()
        sec = round(time.time() - t0, 2)
        out[name] = {"sec": sec, "rows": n}
        print(f"# {name}: {n} rows in {sec}s", file=sys.stderr)
        clear_shingle_cache(spark)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "queries": out,
                "total_sec": round(sum(q["sec"] for q in out.values()), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
