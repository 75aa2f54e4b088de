"""Round-9 batch-4 operators: phrase_search (positional intersection),
cluster_topics (lift-ranked distinctive terms), ams_f2 (F2 sketch)."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# phrase_search


def test_phrase_search_counts_and_positions(spark):
    from pangool_spark.operators.text import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "the quick fox and the quick fox again"),
            (2, "quick fox"),
            (3, "the fox quick"),
            (4, "quick quick fox"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(docs, "quick fox").collect()
    }
    assert got == {1: (2, 2), 2: (1, 1), 4: (1, 2)}  # doc 3 absent


def test_phrase_search_single_term_and_repeated(spark):
    from pangool_spark.operators.text import phrase_search

    docs = spark.createDataFrame(
        [(1, "a b a a b"), (2, "b b")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(docs, "a").collect()
    }
    assert got == {1: 3}
    # repeated-token phrase "a a" matches the contiguous pair only
    got2 = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(docs, "a a").collect()
    }
    assert got2 == {1: (1, 3)}


def test_phrase_search_case_normalized_and_empty_raises(spark):
    from pangool_spark.operators.text import phrase_search

    docs = spark.createDataFrame([(1, "Hello World")], ["doc_id", "text"])
    assert phrase_search(docs, "hello world").count() == 1
    with pytest.raises(ValueError, match="non-empty"):
        phrase_search(docs, "   ")


# ---------------------------------------------------------------------------
# cluster_topics


def test_cluster_topics_lift_ranks_distinctive_terms(spark):
    from pangool_spark.operators.ml import cluster_topics

    # cluster 0 docs are about "cats", cluster 1 about "dogs"; "the" is
    # common everywhere so lift ~1 keeps it below the distinctive terms
    docs = spark.createDataFrame(
        [
            (1, "the cats cats cats"),
            (2, "the cats cats cats"),
            (3, "the dogs dogs dogs"),
            (4, "the dogs dogs dogs"),
        ],
        ["doc_id", "text"],
    )
    assign = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], ["doc_id", "cell"]
    )
    out = cluster_topics(assign, docs, top_k=1, min_count=2)
    got = {r["cluster"]: (r["term"], r["lift"]) for r in out.collect()}
    assert got[0][0] == "cats" and got[1][0] == "dogs"
    # lift of an exclusive term = N_c_share⁻¹ = 2.0 here (6/3 over 6/12... )
    assert got[0][1] == pytest.approx(2.0)


def test_cluster_topics_min_count_floors(spark):
    from pangool_spark.operators.ml import cluster_topics

    docs = spark.createDataFrame(
        [(1, "rare common common common")], ["doc_id", "text"]
    )
    assign = spark.createDataFrame([(1, 0)], ["doc_id", "cell"])
    out = cluster_topics(assign, docs, top_k=5, min_count=2)
    assert {r["term"] for r in out.collect()} == {"common"}


# ---------------------------------------------------------------------------
# ams_f2


def test_ams_f2_estimates_self_join_size(spark):
    from pangool_spark.operators.sketch import ams_f2

    # 100 keys uniform + one heavy key: F2 dominated by the heavy key
    rows = [(i % 100,) for i in range(200)] + [(999,)] * 50
    df = spark.createDataFrame(rows, "k BIGINT").repartition(8)
    [r] = ams_f2(df, "k").collect()
    exact = 100 * 4 + 50 * 50  # 100 keys with f=2, one with f=50
    assert r["exact_f2"] == exact
    assert r["n_counters"] == 64
    # AMS with 64 counters: expect the estimate within ~50% here
    assert r["rel_err"] < 0.5
    assert r["est_f2"] == pytest.approx(
        exact, rel=r["rel_err"] + 1e-9
    )


def test_ams_f2_deterministic_across_partitionings(spark):
    from pangool_spark.operators.sketch import ams_f2

    rows = [(i % 37,) for i in range(500)]
    a = ams_f2(spark.createDataFrame(rows, "k BIGINT").repartition(2), "k")
    b = ams_f2(spark.createDataFrame(rows, "k BIGINT").repartition(16), "k")
    assert a.collect() == b.collect()


def test_ams_f2_guards(spark):
    from pangool_spark.operators.sketch import ams_f2

    df = spark.createDataFrame([(1,)], "k BIGINT")
    with pytest.raises(ValueError, match="divide"):
        ams_f2(df, "k", n_counters=64, n_groups=5)
    with pytest.raises(ValueError, match="md5 bits"):
        ams_f2(df, "k", n_counters=256, n_groups=4)
