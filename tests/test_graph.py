"""Connected components + cluster-aware dedup."""

from pyspark.sql import functions as F

from pangool_spark.operators.dedup import near_dedup_clusters
from pangool_spark.operators.graph import connected_components


def test_connected_components_merges_chains(spark):
    # components: {1,2,3,4} via chain, {10,11}, isolated vertices absent
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a LONG, id_b LONG"
    )
    comps = {r.vertex: r.component for r in connected_components(edges).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_converges_early(spark):
    edges = spark.createDataFrame([(5, 6)], "id_a LONG, id_b LONG")
    comps = {r.vertex: r.component for r in connected_components(edges, max_iterations=50).collect()}
    assert comps == {5: 5, 6: 5}


def test_near_dedup_clusters_transitive(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today ok"
    rows = [
        (1, base),
        (2, base.replace("lazy", "sleepy")),     # pairs with 1 and 3
        (3, base.replace("lazy", "sleepy").replace("quick", "rapid")),  # pairs with 2, maybe not 1
        (9, "entirely different text about query engines and their optimizers"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = near_dedup_clusters(docs, threshold=0.5)
    ids = sorted(r.doc_id for r in out.select("doc_id").collect())
    # 1,2,3 chain-merge into one cluster (rep=1); 9 survives
    assert ids == [1, 9]


def test_star_matches_label_on_random_graphs(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 60))
        ]
        edges = [e for e in edges if e[0] != e[1]] or [(0, 1)]
        df = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
        by_label = {
            r.vertex: r.component
            for r in connected_components(df, algorithm="label").collect()
        }
        by_star = {
            r.vertex: r.component
            for r in connected_components(df, algorithm="star").collect()
        }
        assert by_star == by_label, f"trial {trial}"


def test_star_handles_high_diameter_chain(spark):
    # A 120-vertex path: label propagation needs 119 rounds (would raise at
    # max_iterations=50); alternating stars converge in O(log n).
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], "id_a LONG, id_b LONG"
    )
    comps = {
        r.vertex: r.component
        for r in connected_components(edges, algorithm="star", max_iterations=12).collect()
    }
    assert set(comps) == set(range(120))
    assert set(comps.values()) == {0}


def test_star_on_string_vertex_ids(spark):
    edges = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("x", "y")],
        "id_a STRING, id_b STRING",
    )
    comps = {
        r.vertex: r.component
        for r in connected_components(edges, algorithm="star").collect()
    }
    assert comps == {
        "doc-a": "doc-a",
        "doc-b": "doc-a",
        "doc-c": "doc-a",
        "x": "x",
        "y": "x",
    }


def test_star_keeps_self_loop_only_vertices(spark):
    edges = spark.createDataFrame([(5, 5), (1, 2)], "id_a LONG, id_b LONG")
    for algo in ("label", "star", "auto"):
        comps = {
            r.vertex: r.component
            for r in connected_components(edges, algorithm=algo).collect()
        }
        assert comps == {1: 1, 2: 1, 5: 5}, algo


def test_auto_converges_via_label_on_shallow_graph(spark):
    # shallow graph: the label probe converges inside probe_rounds and the
    # star fallback never runs
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a LONG, id_b LONG"
    )
    comps = {
        r.vertex: r.component
        for r in connected_components(edges, algorithm="auto", probe_rounds=8).collect()
    }
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_auto_falls_back_to_star_on_high_diameter(spark):
    # A 60-vertex path with a 3-round probe: label propagation cannot
    # finish, auto must hand off to the star algorithm and still produce
    # the exact components — no caller diameter guess needed.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], "id_a LONG, id_b LONG"
    )
    comps = {
        r.vertex: r.component
        for r in connected_components(
            edges, algorithm="auto", probe_rounds=3, max_iterations=12
        ).collect()
    }
    assert set(comps) == set(range(60))
    assert set(comps.values()) == {0}


def test_pagerank_fixed_iterations(spark):
    """A 3-node chain a->b->c: closed-form ranks after 2 iterations from
    the uniform start (teleport t=(1-d)/3, contributions pass whole rank
    along the chain); dangling c contributes nothing back."""
    from pangool_spark.operators.graph import pagerank

    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "src STRING, dst STRING")
    got = {r.node: r.rank for r in pagerank(edges, iterations=2).collect()}
    d, n = 0.85, 3
    t = (1.0 - d) / n
    r1 = {"a": t, "b": t + d * (1 / 3), "c": t + d * (1 / 3)}
    want = {"a": t, "b": t + d * r1["a"], "c": t + d * r1["b"]}
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k
    # probability mass is conserved up to the dangling leak
    import pytest as _pt
    with _pt.raises(ValueError):
        pagerank(edges, iterations=0)
