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


def py_encode(word, merges):
    """Reference encoder: apply merges in rank order, each a greedy
    left-to-right pass over the token list."""
    t = list(word)
    for l, r in merges:
        out, i = [], 0
        while i < len(t):
            if i + 1 < len(t) and t[i] == l and t[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(t[i])
                i += 1
        t = out
    return t


def test_encode_matches_reference(spark):
    from pangool_spark.operators.text import bpe_encode

    rng = random.Random(13)
    merges = [("a", "a"), ("b", "a"), ("aa", "b"), ("c", "aab")]
    texts = []
    for _ in range(40):
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 9)))
            for _ in range(rng.randint(1, 6))
        ]
        texts.append(" ".join(words))
    texts += ["aaaa aaab caab", "  ", "b"]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["encoded"])
        for r in bpe_encode(df, merges).collect()
    }
    for i, t in rows:
        words = [w for w in t.lower().split() if w]
        if not words:
            assert i not in got  # nothing to encode
            continue
        toks = [tok for w in words for tok in py_encode(w, merges)]
        assert got[i] == (len(toks), " ".join(toks)), (i, t)


def test_encode_guards(spark):
    from pangool_spark.operators.text import bpe_encode

    df = spark.createDataFrame([(1, "ab")], "doc_id int, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bpe_encode(df, [])
    with pytest.raises(ValueError, match="bad merge pair"):
        bpe_encode(df, [("a", "")])
    with pytest.raises(ValueError, match="bad merge pair"):
        bpe_encode(df, [("a b", "c")])
    bad = spark.createDataFrame([(1, "a\x01b")], "doc_id int, text string")
    with pytest.raises(ValueError, match="delimiter"):
        bpe_encode(bad, [("a", "b")])


def test_token_ids_frequency_ranked_and_dense(spark):
    from pangool_spark.operators.text import bpe_token_ids

    texts = ["aa ab aa", "ab aa zz", "aa"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    merges = [("a", "a")]
    rows = bpe_token_ids(df, merges).collect()
    # reference: encode each word, count tokens, rank (count desc, token)
    from collections import Counter

    def enc_word(w):
        return ["aa" if t == "aa" else t for t in py_encode(w, merges)]

    seqs = {}
    for i, t in enumerate(texts):
        toks = []
        for w in t.split():
            toks += py_encode(w, merges)
        seqs[i] = toks
    counts = Counter(tok for toks in seqs.values() for tok in toks)
    ranked = sorted(counts, key=lambda t: (-counts[t], t))
    want_id = {t: i + 1 for i, t in enumerate(ranked)}
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], {})[r["pos"]] = (r["token"], r["token_id"])
    for i, toks in seqs.items():
        assert [got[i][p][0] for p in range(len(toks))] == toks
        assert [got[i][p][1] for p in range(len(toks))] == [want_id[t] for t in toks]
    ids = {r["token_id"] for r in rows}
    assert ids == set(range(1, len(ranked) + 1))  # dense 1..|vocab|


def test_bigram_lm_reference_parity(spark):
    from collections import Counter

    from pangool_spark.operators.text import bigram_lm

    texts = ["a b a b c", "b c b", "a", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        (r["w1"], r["w2"]): (r["n"], r["n_prefix"], r["prob"])
        for r in bigram_lm(df).collect()
    }
    bigrams = Counter()
    prefix = Counter()
    for t in texts:
        toks = t.split()
        for a, b in zip(toks, toks[1:]):
            bigrams[(a, b)] += 1
            prefix[a] += 1
    want = {
        (a, b): (n, prefix[a], float(n) / float(prefix[a]))
        for (a, b), n in bigrams.items()
    }
    assert got == want
    # per-prefix probabilities sum to 1 without pruning
    sums = {}
    for (a, _b), (_n, _np, p) in got.items():
        sums[a] = sums.get(a, 0.0) + p
    assert all(abs(s - 1.0) < 1e-12 for s in sums.values())
    # pruning keeps prefix totals (probs stay <= 1, not renormalized)
    pruned = {
        (r["w1"], r["w2"]): r
        for r in bigram_lm(df, min_count=2).collect()
    }
    assert set(pruned) == {k for k, n in bigrams.items() if n >= 2}
    for k, r in pruned.items():
        assert r["n_prefix"] == prefix[k[0]]


def test_vocab_coverage_reference(spark):
    import pytest
    from collections import Counter

    from pangool_spark.operators.text import vocab_coverage

    texts = ["a a a b b c", "a b d", "e"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r["k"]: (r["covered"], r["total"], r["coverage"])
        for r in vocab_coverage(df, [1, 2, 3, 100]).collect()
    }
    counts = Counter(t for txt in texts for t in txt.split())
    ranked = sorted(counts, key=lambda t: (-counts[t], t))
    total = sum(counts.values())
    for k in (1, 2, 3, 100):
        cov = sum(counts[t] for t in ranked[:k])
        assert got[k] == (cov, total, float(cov) / float(total))
    assert got[100][2] == 1.0
    with pytest.raises(ValueError, match="ks"):
        vocab_coverage(df, [])
    with pytest.raises(ValueError, match=">= 1"):
        vocab_coverage(df, [0])
