"""gaps_islands vs a brute-force run scanner on random sparse sequences."""

import random

import pytest

from pangool_spark.operators.windows import gaps_islands


def _brute_islands(rows):
    by_k = {}
    for k, p in rows:
        if k is not None and p is not None:
            by_k.setdefault(k, set()).add(p)
    out = set()
    for k, ps in by_k.items():
        ps = sorted(ps)
        start = prev = ps[0]
        for p in ps[1:]:
            if p != prev + 1:
                out.add((k, start, prev, prev - start + 1))
                start = p
            prev = p
        out.add((k, start, prev, prev - start + 1))
    return out


def test_islands_match_bruteforce(spark):
    rng = random.Random(23)
    rows = []
    for k in range(8):
        # sparse positions with duplicates and negative values
        rows += [
            (k, rng.randint(-20, 60)) for _ in range(rng.randint(1, 80))
        ]
    rows += [(None, 5), (3, None)]  # dropped
    df = spark.createDataFrame(rows, "k int, pos int")
    got = {
        (r["k"], r["island_start"], r["island_end"], r["island_len"])
        for r in gaps_islands(df, ["k"], "pos").collect()
    }
    assert got == _brute_islands(rows)


def test_islands_guards(spark):
    df = spark.createDataFrame([(1, 1.5)], "k int, pos double")
    with pytest.raises(ValueError, match="integer-typed"):
        gaps_islands(df, ["k"], "pos")
    with pytest.raises(ValueError, match="key column"):
        gaps_islands(df, [], "pos")


def test_single_island_and_prefix(spark):
    df = spark.createDataFrame(
        [(1, 4), (1, 5), (1, 6), (1, 6)], "k int, pos int"
    )
    [r] = gaps_islands(df, ["k"], "pos", out_prefix="run").collect()
    assert (r["run_start"], r["run_end"], r["run_len"]) == (4, 6, 3)
