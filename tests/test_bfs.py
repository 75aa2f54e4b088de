"""bfs_distances: fixed-round multi-source BFS vs a pure-Python BFS."""

import random
from collections import deque

from pangool_spark.operators.graph import bfs_distances


def _py_bfs(edges, seeds, rounds):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        v = q.popleft()
        if dist[v] >= rounds:
            continue
        for w in adj.get(v, ()):
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
    return dist


def _run(spark, edges, seeds, rounds):
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    s = spark.createDataFrame([(x,) for x in seeds], "v bigint")
    return {
        r.v: r.dist
        for r in bfs_distances(e, s, max_iter=rounds).collect()
    }


def test_path_graph_truncates_at_max_iter(spark):
    edges = [(i, i + 1) for i in range(1, 6)]  # 1-2-3-4-5-6
    got = _run(spark, edges, [1], 3)
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5,6 unreached -> absent


def test_multi_source_takes_min_distance(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    got = _run(spark, edges, [1, 5], 2)
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_random_graph_matches_python_bfs(spark):
    rng = random.Random(0xBF5)
    n = 40
    edges = [
        (rng.randint(0, n), rng.randint(0, n)) for _ in range(70)
    ]
    seeds = [0, 7, 13]
    for rounds in (1, 2, 3):
        want = _py_bfs(edges, seeds, rounds)
        got = _run(spark, edges, seeds, rounds)
        assert got == want, f"rounds={rounds}"
