"""Text-analysis operator semantics."""

import pytest

from pangool_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    token_stats,
    tokenize,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox and the lazy dog in the yard"),
        (2, "der hund und die katze sind nicht das problem"),
        (3, "xyzzy plugh"),
        (4, "Hello, world! 123 foo-bar"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_tokenize(docs):
    toks = tokenize(docs.filter("doc_id = 3"))
    assert sorted(r.word for r in toks.collect()) == ["plugh", "xyzzy"]


def test_token_stats(docs):
    row = {r.doc_id: r for r in token_stats(docs).collect()}
    assert row[3].n_tokens == 2
    # "Hello, world! 123 foo-bar" → Hello , world ! 123 foo - bar
    assert row[4].n_tokens == 4
    assert row[4].n_bpe_tokens == 8


def test_language_id(docs):
    out = {r.doc_id: r.lang_pred for r in language_id(docs).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "und"


def test_quality_score_ratios(docs):
    row = {r.doc_id: r for r in quality_score(docs).collect()}
    # "The quick brown fox and the lazy dog in the yard": 11 tokens,
    # stopwords = the×3 + and + in = 5
    assert row[1].stopword_ratio == pytest.approx(5 / 11)
    assert 0 < row[1].space_ratio < 0.3
    assert row[3].stopword_ratio == 0.0


def test_fingerprint_stable_under_ws_case(spark):
    df = spark.createDataFrame(
        [(1, "A  b\tC"), (2, "a b c"), (3, "abc")], "doc_id LONG, text STRING"
    )
    fps = {r.doc_id: r.fingerprint for r in fingerprint(df).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_winnow_fingerprints_shared_substring_guarantee(spark):
    # Winnowing guarantee: documents sharing a substring of length >=
    # k + window - 1 share at least one fingerprint; disjoint docs
    # overwhelmingly do not.
    from pangool_spark.operators.text import winnow_fingerprints

    shared = "xqzjvkwpyfnbgd"  # 14 chars > k+window-1 = 11, rare letters
    docs = spark.createDataFrame(
        [
            (1, "first document body containing " + shared + " inside it"),
            (2, shared + " appears here too with other words around"),
            (3, "completely unrelated material with no overlap at all"),
        ],
        "doc_id LONG, text STRING",
    )
    fps = {}
    for r in winnow_fingerprints(docs, k=8, window=4).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2]
    assert not (fps[1] & fps[3] and fps[2] & fps[3])


def test_winnow_fingerprints_large_document(spark):
    # A ~1 MB document must complete quickly: the k-gram hashes are built
    # in-row (O(L) bytes), never as per-position rows carrying the full
    # text (the old shape materialized O(L^2) ~ 1 TB for a 1 MB doc).
    import random

    from pangool_spark.operators.text import winnow_fingerprints

    rng = random.Random(7)
    big = "".join(rng.choice("abcdefgh ") for _ in range(1_000_000))
    docs = spark.createDataFrame([(1, big)], "doc_id LONG, text STRING")
    n = winnow_fingerprints(docs, k=8, window=4).count()
    # window-min selection keeps roughly 2/(window+1) of positions distinct
    assert 0 < n < 1_000_000


def test_chunk_documents_overlap_and_tail(spark):
    from pangool_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame([(1, words), (2, "solo")], "doc_id LONG, text STRING")
    out = {(r.doc_id, r.chunk_idx): r for r in chunk_documents(docs, chunk_tokens=4, overlap=1).collect()}
    # stride 3: starts 0,3,6,9 for 10 tokens
    assert {(i, c) for i, c in out} == {(1, 0), (1, 1), (1, 2), (1, 3), (2, 0)}
    assert out[(1, 0)].chunk_text == "w0 w1 w2 w3"
    assert out[(1, 1)].chunk_text == "w3 w4 w5 w6"  # 1-token overlap
    assert out[(1, 3)].chunk_text == "w9" and out[(1, 3)].n_chunk_tokens == 1
    assert out[(2, 0)].chunk_text == "solo"


def test_pii_redact_patterns_and_counts(spark):
    from pangool_spark.operators.text import pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@site.org and 192.168.0.1 card 4111111111111111 tel +4915112345678"),
            (2, "no pii here at all"),
            (3, "two mails x@y.io z@w.co and bad ip 999.1.1.1"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii_redact(df).collect()}
    assert out[1].n_email == 1 and out[1].n_ipv4 == 1 and out[1].n_card == 1 and out[1].n_phone == 1
    assert "<EMAIL>" in out[1].redacted and "<IPV4>" in out[1].redacted
    assert "<CARD>" in out[1].redacted and "<PHONE>" in out[1].redacted
    assert "@" not in out[1].redacted
    assert out[2].redacted == "no pii here at all"
    assert out[2].n_email == out[2].n_ipv4 == out[2].n_card == out[2].n_phone == 0
    # 999.1.1.1 still matches the \d{1,3} quad pattern (syntactic redaction,
    # not semantic validation) — count reflects that
    assert out[3].n_email == 2 and out[3].n_ipv4 == 1


def test_repetition_stats_ratios(spark):
    from pangool_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # all dup tokens + bigrams
            (2, "all words here are unique"),    # no dups
            (3, "one"),                          # too short: ratios 0
            (4, ""),                             # empty
            (5, "a b a b a b"),                  # alternating: dup bigrams
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert out[1].n_tokens == 4 and out[1].dup_token_ratio == 0.75
    assert out[1].dup_bigram_ratio == 2 / 3
    assert out[2].dup_token_ratio == 0.0 and out[2].dup_bigram_ratio == 0.0
    assert out[3].n_tokens == 1 and out[3].dup_token_ratio == 0.0
    assert out[4].n_tokens == 0 and out[4].dup_bigram_ratio == 0.0
    # "a b","b a","a b","b a","a b" -> 5 bigrams, 2 distinct -> 3/5
    assert out[5].dup_bigram_ratio == 0.6


def test_tf_idf_known_values(spark):
    import math

    from pangool_spark.operators.text import tf_idf

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry durian"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = {(r.doc_id, r.term): r for r in tf_idf(docs).collect()}
    # 'apple': tf=2 in doc 1, df=1, N=3 → 2*ln(3)
    r = rows[(1, "apple")]
    assert r.tf == 2 and r.df_t == 1
    assert abs(r.tf_idf - 2 * math.log(3.0)) < 1e-12
    # 'banana' appears in 2 docs → ln(3/2)
    assert abs(rows[(2, "banana")].tf_idf - math.log(1.5)) < 1e-12


def test_tf_idf_top_k(spark):
    from pangool_spark.operators.text import tf_idf

    docs = spark.createDataFrame(
        [(1, "a a b c common"), (2, "d d e f common")],
        "doc_id LONG, text STRING",
    )
    out = tf_idf(docs, top_k=2).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r.term)
    assert all(len(v) == 2 for v in per_doc.values())
    # 'common' (df=2 → idf=0) never wins a top-2 slot
    assert all("common" not in v for v in per_doc.values())


def test_compression_quality_orders_repetitive_below_prose(spark):
    from pangool_spark.operators.text import compression_quality

    docs = spark.createDataFrame(
        [
            (1, "spam " * 200),  # highly repetitive → tiny ratio
            (2, "The quick brown fox jumps over the lazy dog while the engine "
                "shuffles partitions across executors during a wide transform."),
            (3, ""),
            (4, None),
        ],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id: r for r in compression_quality(docs).collect()}
    assert rows[1].compression_ratio < 0.1 < rows[2].compression_ratio
    assert rows[3].compression_ratio == 1.0
    assert rows[4].compression_ratio is None
    # zero shuffles: pure map-side projection
    plan = compression_quality(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_lm_perplexity_flags_gibberish(spark):
    from pangool_spark.operators.text import lm_perplexity

    prose = "the quick brown fox jumps over the lazy dog and then the dog sleeps"
    docs = spark.createDataFrame(
        [
            (1, prose),
            (2, "the dog and the fox and the dog"),   # common transitions
            (3, "zq xj qz jx zx qj zzq xxj"),          # rare transitions
            (4, "a"),                                  # too short → absent
        ],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id: r for r in lm_perplexity(docs).collect()}
    assert 4 not in rows
    # gibberish is less probable than common-transition text under the
    # corpus's own bigram statistics
    assert rows[3].avg_logprob < rows[2].avg_logprob
    assert rows[3].perplexity > rows[2].perplexity
    # bigram accounting: len(normalized)-1 per doc
    assert rows[1].n_bigrams == len(prose) - 1
    # sanity: probabilities, so avg logprob ≤ 0 and perplexity ≥ 1
    assert all(r.avg_logprob <= 0 and r.perplexity >= 1 for r in rows.values())
