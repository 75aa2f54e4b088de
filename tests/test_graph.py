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
