"""bpe_merges_local: the guarded driver-local production trainer ==
the distributed oracle twin (bpe_merges) and the token-list reference,
including deep merge counts the distributed form can't reach."""

import random

import pytest

from tests.test_bpe import py_bpe

D = "\x01"


def _counts(corpus):
    counts = {}
    for line in corpus:
        for w in line.split():
            counts[w] = counts.get(w, 0) + 1
    return counts


def _random_corpus(seed, alphabet="abcd", n_words=30, n_lines=10):
    rng = random.Random(seed)
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        for _ in range(n_words)
    ]
    return [" ".join(rng.choices(words, k=8)) for _ in range(n_lines)]


def test_local_equals_distributed_prefix(spark):
    """Same merges, same segmentation as bpe_merges on the oracled
    3-merge prefix — the local trainer IS a drop-in."""
    from pangool_spark.operators.text import bpe_merges, bpe_merges_local

    corpus = _random_corpus(0x1909)
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    want_merges, want_seg = bpe_merges(df, n_merges=3)
    got_merges, got_seg = bpe_merges_local(df, n_merges=3)
    assert got_merges == want_merges
    assert (
        {(r.w, r.n, r.segmented) for r in got_seg.collect()}
        == {(r.w, r.n, r.segmented) for r in want_seg.collect()}
    )


def test_deep_merges_match_reference(spark):
    """50 merges (past vocabulary exhaustion for some pairs) against the
    recount-every-round token-list reference: the incremental pair-count
    + lazy-heap bookkeeping must agree merge-for-merge."""
    from pangool_spark.operators.text import bpe_merges_local

    for seed in (1, 2, 3):
        corpus = _random_corpus(seed, alphabet="abc", n_words=20)
        df = spark.createDataFrame([(t,) for t in corpus], "text string")
        want_merges, want_seg = py_bpe(_counts(corpus), 50)
        got_merges, got_seg = bpe_merges_local(df, n_merges=50)
        assert got_merges == want_merges, f"seed {seed}"
        assert {r.w: r.segmented for r in got_seg.collect()} == want_seg


def test_merges_exhaust_cleanly(spark):
    # single word, tiny vocab: trainer stops when no pairs remain
    from pangool_spark.operators.text import bpe_merges_local

    df = spark.createDataFrame([("ab ab ab",)], "text string")
    merges, seg = bpe_merges_local(df, n_merges=100)
    assert merges == [("a", "b", 3)]
    assert {r.segmented for r in seg.collect()} == {"ab"}


def test_vocab_guard_raises_naming_fallback(spark):
    from pangool_spark.operators.text import bpe_merges_local

    df = spark.createDataFrame(
        [("alpha beta gamma delta",)], "text string"
    )
    with pytest.raises(ValueError, match="bpe_merges"):
        bpe_merges_local(df, n_merges=1, max_vocab=2)


def test_delimiter_guard(spark):
    from pangool_spark.operators.text import bpe_merges_local

    df = spark.createDataFrame([("bad\x01word",)], "text string")
    with pytest.raises(ValueError, match="delimiter"):
        bpe_merges_local(df, n_merges=1)
