"""duplicate_spans: substring-level dedup (maximal shared token spans).

Closed-form fixtures pin exact span coordinates; a seeded brute-force
sweep checks the anchor-join + diagonal-run-merge against a pure-Python
maximal-run scan on random small-vocab documents (small vocab FORCES
repeated grams and multi-span diagonals — the hard cases).
"""

import random

import pytest

from pangool_spark.operators.dedup import duplicate_spans


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _spans(df):
    return {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_len)
        for r in df.collect()
    }


def brute_spans(docs: dict, k: int):
    """Maximal matching-token runs per (pair, diagonal), length >= k."""
    out = set()
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ta, tb = docs[a], docs[b]
            for diag in range(-len(tb) + 1, len(ta)):
                run_start = None
                run_len = 0
                for pa in range(len(ta) + 1):
                    pb = pa - diag
                    hit = (
                        pa < len(ta)
                        and 0 <= pb < len(tb)
                        and ta[pa] == tb[pb]
                    )
                    if hit:
                        if run_start is None:
                            run_start = pa
                        run_len += 1
                    else:
                        if run_start is not None and run_len >= k:
                            out.add(
                                (a, b, run_start, run_start - diag, run_len)
                            )
                        run_start, run_len = None, 0
    return out


def test_exact_shared_sentence(spark):
    shared = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, "alpha beta " + shared + " gamma"),
        (2, "x y z w " + shared),
        (3, "nothing in common here at all whatsoever today"),
    ]
    out = _spans(duplicate_spans(_df(spark, rows), k=4))
    # shared block = 10 tokens; doc1 offset 2, doc2 offset 4
    assert out == {(1, 2, 2, 4, 10)}


def test_min_len_filters_short_spans(spark):
    rows = [
        (1, "a b c d e long shared block of tokens here p q"),
        (2, "a b c d x y long shared block of tokens here z"),
    ]
    df = _df(spark, rows)
    all_spans = _spans(duplicate_spans(df, k=3))
    # two spans: "a b c d" (4) and "long shared block of tokens here" (6)
    assert {s[4] for s in all_spans} == {4, 6}
    kept = _spans(duplicate_spans(df, k=3, min_len=5))
    assert {s[4] for s in kept} == {6}


def test_max_gram_df_prunes_boilerplate(spark):
    boiler = "subscribe to our newsletter for updates"
    rows = [(i, f"doc {i} body text " + boiler) for i in range(6)]
    rows.append((100, "unique pair alpha beta gamma delta epsilon zeta"))
    rows.append((101, "prefix unique pair alpha beta gamma delta epsilon zeta"))
    df = _df(spark, rows)
    pruned = duplicate_spans(df, k=4, max_gram_df=3)
    got = _spans(pruned)
    # the boilerplate spans (every anchor in >3 docs) are gone; the
    # 2-doc span survives untouched
    assert got == {(100, 101, 0, 1, 8)}
    # without the cap the boilerplate pairs all appear
    full = _spans(duplicate_spans(df, k=4))
    assert len(full) == 1 + 15  # C(6,2) boilerplate pairs + the unique one


def test_brute_force_random_small_vocab(spark):
    rng = random.Random(0xD5)
    vocab = ["a", "b", "c", "d"]
    docs = {
        i: [rng.choice(vocab) for _ in range(rng.randint(5, 40))]
        for i in range(8)
    }
    rows = [(i, " ".join(t)) for i, t in docs.items()]
    for k in (3, 4):
        got = _spans(duplicate_spans(_df(spark, rows), k=k))
        assert got == brute_spans(docs, k), f"mismatch at k={k}"


def test_short_docs_have_no_anchors(spark):
    rows = [(1, "one two"), (2, "one two"), (3, "")]
    assert duplicate_spans(_df(spark, rows), k=5).count() == 0
