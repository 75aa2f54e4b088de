"""AllPairs/PPJoin prefix-filtered exact Jaccard join: brute-force
equivalence on random token sets (the losslessness contract), edge
cases, and the no-global-window plan gate."""

import random

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators.setsim import jaccard_selfjoin, jaccard_text_selfjoin


def _brute(rows, t):
    want = {}
    for i, a in rows:
        for j, b in rows:
            if i < j:
                sa, sb = set(a), set(b)
                if not sa or not sb:
                    continue
                inter = len(sa & sb)
                jac = inter / (len(sa) + len(sb) - inter)
                if jac >= t:
                    want[(i, j)] = jac
    return want


def test_matches_bruteforce_random(spark):
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, rng.sample(vocab, rng.randint(0, 12)))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "id LONG, tokens ARRAY<STRING>")
    for t in (0.3, 0.5, 0.8, 1.0):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in jaccard_selfjoin(df, "id", "tokens", t).collect()
        }
        want = _brute(rows, t)
        assert got.keys() == want.keys(), f"t={t}"
        for k in want:
            assert abs(got[k] - want[k]) < 1e-12, (t, k)


def test_duplicate_tokens_and_exact_dupes(spark):
    df = spark.createDataFrame(
        [
            (1, ["a", "a", "b"]),      # multiset collapses to {a, b}
            (2, ["b", "a"]),           # identical set, different order
            (3, ["c"]),
            (4, []),                   # empty: matches nothing
        ],
        "id LONG, tokens ARRAY<STRING>",
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_selfjoin(df, "id", "tokens", 0.9).collect()
    }
    assert got == {(1, 2): 1.0}
    with pytest.raises(ValueError, match="threshold"):
        jaccard_selfjoin(df, "id", "tokens", 0.0)


def test_text_form_and_plan(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "The  quick brown fox"),   # normalization collapses
            (3, "entirely different words here"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {(r.id_a, r.id_b) for r in jaccard_text_selfjoin(docs, threshold=0.9).collect()}
    assert got == {(1, 2)}
    plan = (
        jaccard_text_selfjoin(docs, threshold=0.9)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # no cartesian, no python, and NO partition-less window (the global
    # token order is a distributed aggregate join, not a row_number)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan


def test_cross_join_matches_bruteforce(spark):
    from pangool_spark.operators.setsim import jaccard_postings_join

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(25)]
    probe = [(i, rng.sample(vocab, rng.randint(1, 10))) for i in range(30)]
    corpus = [(i, rng.sample(vocab, rng.randint(1, 10))) for i in range(40)]

    def _postings(rows):
        return spark.createDataFrame(
            [(i, t) for i, toks in rows for t in toks], "id LONG, token STRING"
        )

    for t in (0.4, 0.7, 1.0):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in jaccard_postings_join(
                _postings(probe), _postings(corpus), threshold=t
            ).collect()
        }
        want = {}
        for ia, a in probe:
            for ib, b in corpus:
                sa, sb = set(a), set(b)
                jac = len(sa & sb) / len(sa | sb)
                if jac >= t:
                    want[(ia, ib)] = jac
        assert got.keys() == want.keys(), f"t={t}"
        for k in want:
            assert abs(got[k] - want[k]) < 1e-12
    # same-id records across relations ARE distinct records
    p = _postings([(7, ["x", "y"])])
    c = _postings([(7, ["x", "y"])])
    assert jaccard_postings_join(p, c, threshold=1.0).count() == 1


def test_containment_join_matches_bruteforce(spark):
    from pangool_spark.operators.setsim import containment_join

    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(40)]
    probe = [(i, rng.sample(vocab, rng.randint(1, 6))) for i in range(25)]
    # corpus records much LARGER than probes: the case Jaccard misses
    corpus = [(i, rng.sample(vocab, rng.randint(10, 30))) for i in range(30)]

    def _postings(rows):
        return spark.createDataFrame(
            [(i, t) for i, toks in rows for t in toks], "id LONG, token STRING"
        )

    for t in (0.5, 1.0):
        got = {
            (r.id_a, r.id_b): r.containment
            for r in containment_join(
                _postings(probe), _postings(corpus), threshold=t
            ).collect()
        }
        want = {}
        for ia, a in probe:
            for ib, b in corpus:
                sa, sb = set(a), set(b)
                c = len(sa & sb) / len(sa)
                if c >= t:
                    want[(ia, ib)] = c
        assert got.keys() == want.keys(), f"t={t}"
        for k in want:
            assert abs(got[k] - want[k]) < 1e-12
    # full containment of a tiny probe in a huge doc: jaccard ~0.1 but
    # containment 1.0 — the asymmetric point
    some = {(ia, ib) for (ia, ib), c in want.items() if c == 1.0}
    assert some  # fixture produces at least one full containment
    import pytest as _pytest
    with _pytest.raises(ValueError, match="threshold"):
        containment_join(_postings(probe), _postings(corpus), threshold=0.0)
