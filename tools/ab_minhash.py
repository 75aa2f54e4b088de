"""Interleaved A/B re-measure of minhash_lsh_dedup (md5-portable) vs
minhash_lsh_dedup_fast (xxhash64) — r09 verdict item 2.

The r09 final bench artifact (captured under host load) showed the fast
twin at 3.10s vs the exact sibling's 1.97s, after 1.52s/1.61s in quieter
sessions — either a real regression in the shared banding path or
measurement noise. Interleaving A,B,A,B,... on an idle box removes the
section-position confound bench.py has (the twins sit in different bench
sections) and lets min-of-N speak.

Usage: python tools/ab_minhash.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pangool_spark.queries import QUERIES, clear_shingle_cache
    from pangool_spark.session import get_spark

    spark = get_spark("ab_minhash")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm

    names = ["minhash_lsh_dedup", "minhash_lsh_dedup_fast"]
    times: dict[str, list[float]] = {n: [] for n in names}
    # one untimed warmup each (codegen/JIT)
    for name in names:
        QUERIES[name](spark, sf_dir).count()
    for i in range(rounds):
        for name in names:
            spark.catalog.clearCache()
            clear_shingle_cache(spark)
            t0 = time.time()
            n_rows = QUERIES[name](spark, sf_dir).count()
            dt = time.time() - t0
            times[name].append(dt)
            print(f"round {i}: {name}: {n_rows} rows in {dt:.3f}s")
    for name in names:
        ts = sorted(times[name])
        print(
            f"{name}: min={ts[0]:.3f} median={ts[len(ts) // 2]:.3f} "
            f"max={ts[-1]:.3f} all={[round(t, 3) for t in times[name]]}"
        )


if __name__ == "__main__":
    main()
