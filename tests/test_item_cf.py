"""item_cf vs a brute-force python cosine-neighborhood computation."""

import math
import random
from collections import defaultdict

import pytest

from pangool_spark.operators.ml import item_cf


def _brute_cf(rows, min_co, top_k, max_user_items=None):
    r = defaultdict(int)
    for u, i, q in rows:
        if None not in (u, i, q):
            r[(u, i)] += q
    if max_user_items is not None:
        per_u = defaultdict(int)
        for u, _ in r:
            per_u[u] += 1
        r = {(u, i): v for (u, i), v in r.items() if per_u[u] <= max_user_items}
    by_u = defaultdict(dict)
    for (u, i), v in r.items():
        by_u[u][i] = v
    norms = defaultdict(int)
    for (u, i), v in r.items():
        norms[i] += v * v
    dots, co = defaultdict(int), defaultdict(int)
    for u, items in by_u.items():
        ks = sorted(items)
        for x in range(len(ks)):
            for y in range(x + 1, len(ks)):
                p = (ks[x], ks[y])
                dots[p] += items[ks[x]] * items[ks[y]]
                co[p] += 1
    out = defaultdict(list)
    for (i, j), d in dots.items():
        if co[(i, j)] < min_co:
            continue
        c = d / (math.sqrt(norms[i]) * math.sqrt(norms[j]))
        out[i].append((j, co[(i, j)], c))
        out[j].append((i, co[(i, j)], c))
    want = set()
    for i, ns in out.items():
        ns.sort(key=lambda t: (-t[2], t[0]))
        for rank, (j, cu, c) in enumerate(ns[:top_k], 1):
            want.add((i, j, cu, round(c, 12), rank))
    return want


def _got(df):
    return {
        (r["item"], r["neighbor"], r["co_users"], round(r["cosine"], 12),
         r["rank"])
        for r in df.collect()
    }


def test_cf_matches_bruteforce(spark):
    rng = random.Random(31)
    rows = [
        (rng.randint(0, 15), rng.randint(0, 10), rng.randint(1, 9))
        for _ in range(300)
    ]
    rows += [(None, 1, 1), (2, None, 1), (3, 4, None)]
    df = spark.createDataFrame(rows, "u int, i int, q int")
    assert _got(item_cf(df, "u", "i", "q", min_co=2, top_k=3)) == _brute_cf(
        rows, 2, 3
    )


def test_cf_power_user_cap(spark):
    rng = random.Random(7)
    rows = [
        (rng.randint(0, 8), rng.randint(0, 12), rng.randint(1, 5))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "u int, i int, q int")
    got = _got(item_cf(df, "u", "i", "q", min_co=1, top_k=4, max_user_items=6))
    assert got == _brute_cf(rows, 1, 4, max_user_items=6)


def test_cf_guards(spark):
    df = spark.createDataFrame([(1, 1, 1)], "u int, i int, q int")
    with pytest.raises(ValueError, match="min_co"):
        item_cf(df, "u", "i", "q", min_co=0)
    with pytest.raises(ValueError, match="top_k"):
        item_cf(df, "u", "i", "q", top_k=0)
