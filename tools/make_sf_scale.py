"""Synthesize a larger scale factor from an existing testdata dir by
replicating every table K times with consistent key offsets — a local
stand-in for driver-generated sf1 so heavy queries can be probed at 10×
the bench scale.

Key properties (so the scaled data stresses like REAL bigger data, not a
copy-paste corpus):

- PK/FK offsets are consistent per replica (replica r adds r*OFFSET to
  every synthetic key), so join cardinalities and selectivities scale
  linearly and referential integrity holds within each replica.
- `documents.text` is replica-salted by suffixing every WORD with the
  replica tag: within-replica duplicate/near-dup structure is preserved
  EXACTLY, while cross-replica shingle similarity drops to zero — dedup
  workloads scale linearly, the way a genuinely larger crawl does.
  Verbatim replication would instead grow LSH candidate pairs ~K², an
  adversarial fixture no real corpus produces.
- `embeddings.embedding` gets a deterministic per-replica direction
  perturbation (index-keyed), so ANN candidate structure scales instead
  of collapsing every replica into one point.
- Fixed dimensions (region, nation) are copied unchanged, as in TPC-H.

Usage: python tools/make_sf_scale.py [src_dir] [dst_dir] [k]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFFSET = 100_000_000  # far above any sf0.1 key


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from pangool_spark.data import load_table
    from pangool_spark.session import get_spark

    spark = get_spark("make_sf_scale")
    os.makedirs(dst, exist_ok=True)

    def replicate(name, key_cols, extra=None):
        base = load_table(spark, src, name)
        parts = []
        for r in range(k):
            df = base
            for c in key_cols:
                df = df.withColumn(c, F.col(c) + F.lit(r * OFFSET))
            if extra is not None:
                df = extra(df, r)
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"{name}: x{k}", file=sys.stderr)

    for name in ("region", "nation"):
        load_table(spark, src, name).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )

    replicate("customer", ["c_custkey"])
    replicate("supplier", ["s_suppkey"])

    def salt_part_names(df, r):
        # suffixes are pairwise Levenshtein-3 apart (" 111" vs " 222"),
        # so cross-replica name pairs can never land inside the fuzzy
        # joins' d≤2 band — within-replica edit-distance structure is
        # unchanged (a shared suffix preserves Levenshtein distances).
        # Verbatim replication puts K identical copies of every name at
        # distance 0, a ~K² candidate blowup no real 10× catalog shows.
        if r == 0:
            return df
        return df.withColumn(
            "p_name", F.concat(F.col("p_name"), F.lit(f" {r}{r}{r}"))
        )

    replicate("part", ["p_partkey"], extra=salt_part_names)
    replicate("orders", ["o_orderkey", "o_custkey"])
    replicate("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    replicate("events", ["event_id", "user_id"])

    def salt_docs(df, r):
        if r == 0:
            return df
        salted = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit(f"_{r}")),
            ),
            " ",
        )
        return df.withColumn("text", salted).withColumn(
            "n_chars", F.length("text")
        )

    replicate("documents", ["doc_id"], extra=salt_docs)

    def perturb_vec(df, r):
        # deterministic per-replica SIGN FLIPS: cos(s∘u, s∘v) = cos(u, v)
        # preserves within-replica similarity structure exactly, while
        # cos(v, s∘v) ≈ mean(s) ≈ 0 decorrelates replicas — additive
        # noise small enough to keep structure leaves cross-replica
        # cosine ≈ 1 and inflates near-dup pairs ~K² (a fixture artifact
        # no real 10× corpus shows)
        if r == 0:
            return df
        flipped = F.transform(
            F.col("embedding"),
            lambda x, i: F.when(
                F.pmod(F.xxhash64(i.cast("long"), F.lit(r)), F.lit(2)) == 0, x
            ).otherwise(-x),
        )
        return df.withColumn("embedding", flipped)

    replicate("embeddings", ["vec_id"], extra=perturb_vec)
    print(f"wrote {dst} at {k}x {src}", file=sys.stderr)


if __name__ == "__main__":
    main()
