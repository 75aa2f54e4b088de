"""span_corruption: T5-style denoising pair construction."""

import pytest


def _one(df):
    [r] = df.collect()
    return r


def test_span_corruption_known_masking(spark):
    from pangool_spark.operators.text import span_corruption

    # denominator 2 over doc 7 masks spans 0 and 1 but not 2, 3 (pinned
    # by the md5 hash of '7:s' — deterministic forever)
    df = spark.createDataFrame(
        [(7, "a b c d e f g h i j k l")], ["doc_id", "text"]
    )
    r = _one(span_corruption(df, span_len=3, mask_denominator=2))
    assert r["n_tokens"] == 12
    assert r["n_masked_spans"] == 2
    assert r["input_text"] == "<extra_id_0> <extra_id_1> g h i j k l"
    assert r["target_text"] == "<extra_id_0> a b c <extra_id_1> d e f"


def test_span_corruption_roundtrip_reconstructs(spark):
    from pangool_spark.operators.text import span_corruption

    # for every doc: substituting each sentinel's target span back into
    # the input must reproduce the normalized text
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(17))) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(4)
    for r in span_corruption(df, span_len=4, mask_denominator=3).collect():
        text = r["input_text"]
        if r["n_masked_spans"]:
            tgt = r["target_text"].split()
            spans: dict[str, list[str]] = {}
            cur = None
            for t in tgt:
                if t.startswith("<extra_id_"):
                    cur = t
                    spans[cur] = []
                else:
                    spans[cur].append(t)
            for sent, toks in spans.items():
                text = text.replace(sent, " ".join(toks))
        assert text == " ".join(f"w{r['doc_id']}_{j}" for j in range(17))


def test_span_corruption_unmasked_doc_empty_target(spark):
    from pangool_spark.operators.text import span_corruption

    # huge denominator: nothing masks
    df = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
    r = _one(span_corruption(df, span_len=2, mask_denominator=10**9))
    assert r["n_masked_spans"] == 0
    assert r["input_text"] == "x y z"
    assert r["target_text"] == ""


def test_span_corruption_partition_invariant(spark):
    from pangool_spark.operators.text import span_corruption

    rows = [(i, " ".join(f"t{j}" for j in range(11))) for i in range(10)]
    a = span_corruption(
        spark.createDataFrame(rows, ["doc_id", "text"]).repartition(1)
    )
    b = span_corruption(
        spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_span_corruption_guards(spark):
    from pangool_spark.operators.text import span_corruption

    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="span_len"):
        span_corruption(df, span_len=0)
    with pytest.raises(ValueError, match="mask_denominator"):
        span_corruption(df, mask_denominator=1)
