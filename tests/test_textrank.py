"""textrank_keywords: graph-centrality keyword extraction — hub terms
outrank peripheral ones, noise edges are pruned by min_count, ranks are
12dp-quantized for a deterministic top-k."""

import pytest


def test_textrank_hub_word_ranks_first(spark):
    from pangool_spark.operators.text import textrank_keywords

    # 'core' co-occurs with every satellite; satellites only see 'core'
    docs = [
        (i, f"core sat{i % 4} core sat{(i + 1) % 4}") for i in range(12)
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = textrank_keywords(df, top_k=10, min_count=2).collect()
    assert rows[0]["term"] == "core"
    assert rows[0]["rank"] == max(r["rank"] for r in rows)
    terms = {r["term"] for r in rows}
    assert {"sat0", "sat1", "sat2", "sat3"} <= terms


def test_textrank_min_count_prunes_noise_edges(spark):
    from pangool_spark.operators.text import textrank_keywords

    # 'rare' co-occurs once — pruned at min_count=2, so it never becomes
    # a vertex; the frequent pair survives
    docs = [(1, "alpha beta rare"), (2, "alpha beta"), (3, "alpha beta")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    terms = {
        r["term"]
        for r in textrank_keywords(df, top_k=10, min_count=2).collect()
    }
    assert terms == {"alpha", "beta"}


def test_textrank_validates_top_k(spark):
    from pangool_spark.operators.text import textrank_keywords

    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="top_k"):
        textrank_keywords(df, top_k=0)


def test_textrank_empty_edge_list_returns_empty_relation(spark):
    from pangool_spark.operators.text import textrank_keywords

    # every pair occurs once -> min_count=2 prunes all edges; "no
    # keywords" must be an empty relation, not a ZeroDivisionError
    df = spark.createDataFrame(
        [(1, "one two"), (2, "three four")], "doc_id bigint, text string"
    )
    out = textrank_keywords(df, top_k=5, min_count=2)
    assert out.columns == ["term", "rank"]
    assert out.count() == 0
