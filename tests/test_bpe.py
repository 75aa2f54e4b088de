"""bpe_merges: BPE merge training vs a pure-Python token-list reference."""

import random

import pytest

D = "\x01"


def py_bpe(word_counts, n_merges):
    """Token-list reference: greedy left-to-right merge application,
    argmax by (count DESC, delimited pair string ASC) — the operator's
    exact tie-break."""
    segs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, n in word_counts.items():
            t = segs[w]
            for a, b in zip(t, t[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        best = min(
            counts.items(),
            key=lambda kv: (-kv[1], f"{D}{kv[0][0]}{D} {D}{kv[0][1]}{D}"),
        )
        (l, r), c = best
        merges.append((l, r, c))
        for w, t in segs.items():
            out, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == l and t[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            segs[w] = out
    return merges, {w: " ".join(t) for w, t in segs.items()}


def _run(spark, texts, n_merges):
    from pangool_spark.operators.text import bpe_merges

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, seg = bpe_merges(df, n_merges=n_merges)
    return merges, {r.w: (r.n, r.segmented) for r in seg.collect()}


def test_closed_form_merges(spark):
    # 'low' x3, 'lower' x1: round1 merges (l,o) c=4, round2 (lo,w) c=4
    texts = ["low low", "low lower"]
    merges, seg = _run(spark, texts, 2)
    assert merges == [("l", "o", 4), ("lo", "w", 4)]
    assert seg == {"low": (3, "low"), "lower": (1, "low e r")}


def test_same_symbol_runs_merge_greedily(spark):
    # 'aaaaa': pairs (a,a) x4 weight 1 -> merge -> aa aa a
    merges, seg = _run(spark, ["aaaaa"], 1)
    assert merges == [("a", "a", 4)]
    assert seg["aaaaa"] == (1, "aa aa a")


def test_random_corpus_matches_reference(spark):
    rng = random.Random(0xB9E)
    words = [
        "".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
        for _ in range(30)
    ]
    corpus = [" ".join(rng.choices(words, k=8)) for _ in range(10)]
    counts = {}
    for line in corpus:
        for w in line.split():
            counts[w] = counts.get(w, 0) + 1
    want_merges, want_seg = py_bpe(counts, 4)
    merges, seg = _run(spark, corpus, 4)
    assert merges == want_merges
    assert {w: s for w, (n, s) in seg.items()} == want_seg
    assert {w: n for w, (n, s) in seg.items()} == counts


def test_delimiter_in_corpus_raises(spark):
    from pangool_spark.operators.text import bpe_merges

    df = spark.createDataFrame([("bad\x01word",)], "text string")
    with pytest.raises(ValueError, match="delimiter"):
        bpe_merges(df, n_merges=1)
