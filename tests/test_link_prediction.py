"""link_prediction: brute-force parity on random graphs, adjacency
exclusion, hub pruning, and the exact Jaccard arithmetic."""

import itertools
import random

from pangool_spark.operators.graph import link_prediction


def py_reference(edge_list, min_common=1, max_apex_degree=None):
    adj = {}
    edges = set()
    for a, b in edge_list:
        if a == b:
            continue
        a, b = min(a, b), max(a, b)
        if (a, b) in edges:
            continue
        edges.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    out = {}
    for u, v in itertools.combinations(sorted(adj), 2):
        if (u, v) in edges:
            continue
        common = {
            w
            for w in adj[u] & adj[v]
            if max_apex_degree is None or deg[w] <= max_apex_degree
        }
        if len(common) >= min_common:
            j = float(len(common)) / float(deg[u] + deg[v] - len(common))
            out[(u, v)] = (len(common), deg[u], deg[v], j)
    return out


def check(spark, edge_list, **kw):
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {
        (r["u"], r["v"]): (
            r["common_neighbors"],
            r["deg_u"],
            r["deg_v"],
            r["jaccard"],
        )
        for r in link_prediction(df, **kw).collect()
    }
    assert got == py_reference(edge_list, **kw)


def test_random_graphs_match_bruteforce(spark):
    rng = random.Random(5)
    for trial in range(3):
        n = 14
        edge_list = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(30)
        ]
        check(spark, edge_list)


def test_square_predicts_diagonals(spark):
    # cycle 0-1-2-3-0: diagonals (0,2) and (1,3) each share 2 neighbors
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    got = {
        (r["u"], r["v"]): (r["common_neighbors"], r["jaccard"])
        for r in link_prediction(df).collect()
    }
    assert got == {(0, 2): (2, 1.0), (1, 3): (2, 1.0)}


def test_adjacent_pairs_excluded_and_min_common(spark):
    rng = random.Random(9)
    edge_list = [(rng.randrange(10), rng.randrange(10)) for _ in range(25)]
    check(spark, edge_list, min_common=2)


def test_hub_prune_drops_superhub_wedges(spark):
    # star center 99 connects 0..5; plus edge (0,1): without the cap the
    # star makes every leaf pair a candidate, with cap=2 only apexes of
    # degree <= 2 count (0 and 1 have degree 2)
    edge_list = [(99, i) for i in range(6)] + [(0, 1)]
    check(spark, edge_list, max_apex_degree=2)
    check(spark, edge_list)  # exact run on the same graph
