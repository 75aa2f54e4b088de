"""Round-7 new operators: bloom_prune_join (runtime-filter join),
line_dedup (C4/Gopher cross-doc boilerplate removal), dataset_diff
(keyed snapshot diff)."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.data import load_table


def test_bloom_prune_join_equals_plain_join(spark, sf_dir):
    from pangool_spark.operators.joins import bloom_prune_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_partkey", "p_partkey"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 1)
        .select("p_partkey", "p_name")
    )
    got = bloom_prune_join(li, part, ["p_partkey"])
    want = li.join(part, ["p_partkey"])
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # the probe filter reaches the fact side pre-join, as a codegen expr
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "element_at" in plan
    # semi form agrees too
    gs = bloom_prune_join(li, part.select("p_partkey"), ["p_partkey"], how="left_semi")
    ws = li.join(part.select("p_partkey"), ["p_partkey"], "left_semi")
    assert gs.count() == ws.count()


def test_bloom_prune_join_guards(spark):
    from pangool_spark.operators.joins import bloom_prune_join

    a = spark.createDataFrame([(1, "x")], "k LONG, v STRING")
    b = spark.createDataFrame([(1, "y")], "k LONG, w STRING")
    with pytest.raises(ValueError, match="fact"):
        bloom_prune_join(a, b, ["k"], how="left")
    with pytest.raises(ValueError, match="fpp"):
        bloom_prune_join(a, b, ["k"], fpp=1.5)
    # empty dim -> empty inner result, no crash
    assert bloom_prune_join(a, b.filter("k < 0"), ["k"]).count() == 0
    # multi-column key
    c = spark.createDataFrame([(1, "x", 5), (2, "x", 6)], "k LONG, v STRING, z INT")
    d = spark.createDataFrame([(1, "x", 7)], "k LONG, v STRING, y INT")
    got = bloom_prune_join(c, d, ["k", "v"])
    assert got.count() == c.join(d, ["k", "v"]).count() == 1


def test_line_dedup_removes_cross_doc_boilerplate(spark):
    from pangool_spark.operators.text import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "unique one\nCOMMON BANNER\nbody text a"),
            (2, "COMMON BANNER\n\nbody text b"),
            (3, "body text c\n  COMMON BANNER  "),  # trim-matched
            (4, ""),
        ],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: r.text for r in line_dedup(docs).collect()}
    assert got[1] == "unique one\nbody text a"
    assert got[2] == "\nbody text b"  # blank line is formatting, kept
    assert got[3] == "body text c"
    assert got[4] == ""  # empty doc survives as empty
    # repeats WITHIN one doc don't count as cross-doc
    solo = spark.createDataFrame(
        [(1, "same\nsame"), (2, "other")], "doc_id LONG, text STRING"
    )
    got = {r.doc_id: r.text for r in line_dedup(solo).collect()}
    assert got[1] == "same\nsame"
    # min_docs raises the bar
    assert {
        r.doc_id: r.text for r in line_dedup(docs, min_docs=4).collect()
    }[1] == "unique one\nCOMMON BANNER\nbody text a"


def test_line_dedup_keep_first(spark):
    from pangool_spark.operators.text import line_dedup

    docs = spark.createDataFrame(
        [
            (5, "LICENSE HEADER\nfive"),
            (2, "LICENSE HEADER\ntwo"),
            (9, "LICENSE HEADER\nnine"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: r.text for r in line_dedup(docs, keep_first=True).collect()}
    assert got == {2: "LICENSE HEADER\ntwo", 5: "five", 9: "nine"}


def test_dataset_diff_statuses(spark):
    from pangool_spark.operators.upsert import dataset_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30)], "k LONG, v STRING, x INT"
    )
    new = spark.createDataFrame(
        [(2, "b", None), (3, "CHANGED", 30), (4, "d", 40)], "k LONG, v STRING, x INT"
    )
    got = {r.k: r.status for r in dataset_diff(old, new, ["k"]).collect()}
    # key 2 identical (null-safe: NULL == NULL) -> omitted
    assert got == {1: "removed", 3: "changed", 4: "added"}
    # compare_cols narrows change detection: x alone is identical for 3
    got = {r.k: r.status for r in dataset_diff(old, new, ["k"], ["x"]).collect()}
    assert got == {1: "removed", 4: "added"}
    # empty key list rejected
    with pytest.raises(ValueError):
        dataset_diff(old, new, [])


def test_salted_join_equals_plain_join(spark):
    from pangool_spark.operators.partitioning import salted_join

    # a skewed big side: key 1 dominates
    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 900), (3, 901), (9, 902)],
        "k LONG, payload LONG",
    )
    small = spark.createDataFrame(
        [(1, "one"), (2, "two"), (4, "four")], "k LONG, name STRING"
    )
    for how in ("inner", "left"):
        got = salted_join(big, small, ["k"], n_salts=8, how=how)
        want = big.join(small, ["k"], how)
        assert got.exceptAll(want).count() == 0, how
        assert want.exceptAll(got).count() == 0, how
    # the physical join key includes the salt
    plan = salted_join(big, small, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "__salt__" in plan
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(big, small, ["k"], how="right")


def test_agg_state_merge_equals_full_recompute(spark):
    from pangool_spark.operators.grouping import agg_state, merge_agg_states

    spec = {
        "n": ("count", "v"),
        "total": ("sum", "v"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
    }
    day1 = spark.createDataFrame(
        [("a", 1), ("a", 5), ("b", 3)], "k STRING, v INT"
    )
    day2 = spark.createDataFrame(
        [("a", 2), ("c", 7), ("c", None)], "k STRING, v INT"
    )
    state = agg_state(day1, ["k"], spec)
    merged = merge_agg_states(state, agg_state(day2, ["k"], spec), ["k"], spec)
    want = agg_state(day1.unionByName(day2), ["k"], spec)
    got = {r.k: (r.n, r.total, r.lo, r.hi) for r in merged.collect()}
    exp = {r.k: (r.n, r.total, r.lo, r.hi) for r in want.collect()}
    assert got == exp
    # nulls don't count, count merges with SUM not COUNT
    assert got["c"] == (1, 7, 7, 7)
    with pytest.raises(ValueError, match="agg_state"):
        agg_state(day1, ["k"], {"bad": ("avg", "v")})


def test_naive_bayes_train_and_classify(spark):
    """Reference parity: tokenization (StringTokenizer + ASCII-punct
    strip, pure-punct tokens become the '' vocab entry), per-(word,
    category) counts, add-1 smoothing; token-less docs -> NULL."""
    from pangool_spark.operators.ml import naive_bayes_classify, naive_bayes_train

    train = spark.createDataFrame(
        [
            ("POSITIVE", "I love this great movie"),
            ("POSITIVE", "great fantastic love it!"),
            ("NEGATIVE", "I hate this terrible movie"),
            ("NEGATIVE", "awful, terrible hate."),
        ],
        "category STRING, text STRING",
    )
    model = naive_bayes_train(train)
    counts = {(r.category, r.word): r["count"] for r in model.collect()}
    assert counts[("POSITIVE", "love")] == 2
    assert counts[("NEGATIVE", "terrible")] == 2
    # "it!" normalizes to "it"; "awful," to "awful"
    assert ("POSITIVE", "it") in counts and ("NEGATIVE", "awful") in counts

    docs = spark.createDataFrame(
        [(1, "love great"), (2, "terrible awful hate"), (4, ""), (5, "  ")],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: r.predicted for r in naive_bayes_classify(docs, model).collect()}
    assert got[1] == "POSITIVE"
    assert got[2] == "NEGATIVE"
    assert got[4] is None and got[5] is None  # no tokens, like the reference


def test_inverted_index_and_bounds(spark):
    from pangool_spark.operators.text import inverted_index

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "banana")],
        "doc_id LONG, text STRING",
    )
    idx = {r.term: (r.df, [(p.doc_id, p.tf) for p in r.postings])
           for r in inverted_index(docs).collect()}
    assert idx["apple"] == (1, [(1, 2)])
    assert idx["banana"] == (3, [(1, 1), (2, 1), (3, 1)])
    # df bounds prune both tails
    only_mid = {r.term for r in inverted_index(docs, min_df=2, max_df=2).collect()}
    assert only_mid == set()  # banana df=3 > 2, others df=1 < 2
    assert {r.term for r in inverted_index(docs, min_df=3).collect()} == {"banana"}


def test_cooccurrence_pairs_window(spark):
    from pangool_spark.operators.text import cooccurrence_pairs

    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "b a")], "doc_id LONG, text STRING"
    )
    got = {(r.term_a, r.term_b): r.n for r in cooccurrence_pairs(docs, window=2).collect()}
    # doc1 pairs (w=2): (a,b),(a,c),(b,c),(b,a),(c,a); doc2: (b,a)
    assert got == {("a", "b"): 3, ("a", "c"): 2, ("b", "c"): 1}
    w1 = {(r.term_a, r.term_b): r.n for r in cooccurrence_pairs(docs, window=1).collect()}
    assert w1 == {("a", "b"): 2, ("b", "c"): 1, ("a", "c"): 1}


def test_triangle_count_matches_bruteforce(spark):
    import itertools
    import random

    from pangool_spark.operators.graph import triangle_count

    rng = random.Random(5)
    edges = list({(rng.randint(0, 15), rng.randint(0, 15)) for _ in range(60)})
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = triangle_count(df).collect()[0].n_triangles
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    brute = sum(
        1
        for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    assert got == brute
    # self-loops and duplicate/reverse edges are ignored
    noisy = df.union(spark.createDataFrame([(1, 1), (2, 2)], "src LONG, dst LONG"))
    assert triangle_count(noisy).collect()[0].n_triangles == brute


def test_bm25_score_ranking(spark):
    """BM25 sanity on a controlled corpus: higher tf wins within equal
    lengths; rare terms outweigh common ones; non-matching docs absent;
    top_k plans TakeOrderedAndProject (no partition-less window)."""
    from pangool_spark.operators.text import bm25_score

    docs = spark.createDataFrame(
        [
            (1, "cat cat cat dog"),
            (2, "cat dog fish bird"),
            (3, "fish bird bird bird"),
            (4, "tree tree tree tree"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: (r.n_matched, r.score) for r in bm25_score(docs, ["cat"]).collect()}
    assert set(got) == {1, 2}
    assert got[1][1] > got[2][1]  # tf 3 beats tf 1 at equal length
    # rare "fish" (df 2) contributes more than common... both df 2; check multi-term
    multi = {r.doc_id: r.n_matched for r in bm25_score(docs, ["cat", "fish"]).collect()}
    assert multi == {1: 1, 2: 2, 3: 1}
    top = bm25_score(docs, ["cat"], top_k=1)
    assert [r.doc_id for r in top.collect()] == [1]
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_triangle_count_approx_estimator(spark):
    """DOULION: the estimate equals brute-force-on-the-sampled-graph / p³
    (deterministic hash sampling, no RNG), and p=1 degenerates to the
    exact count."""
    import random

    from pangool_spark.operators.graph import triangle_count, triangle_count_approx

    rng = random.Random(9)
    edges = list({(rng.randint(0, 20), rng.randint(0, 20)) for _ in range(120)})
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    exact = triangle_count(df).collect()[0].n_triangles
    full = triangle_count_approx(df, p=1.0).collect()[0]
    assert full.n_sampled_triangles == exact and full.n_triangles_est == exact
    est = triangle_count_approx(df, p=0.6).collect()[0]
    # scale is 1/(p*p*p) — same multiply chain, not pow (last-bit differs)
    assert est.scale == 1.0 / (0.6 * 0.6 * 0.6)
    assert est.n_triangles_est == est.n_sampled_triangles * est.scale
    # deterministic: same sample both times
    est2 = triangle_count_approx(df, p=0.6).collect()[0]
    assert est.n_sampled_triangles == est2.n_sampled_triangles
    with pytest.raises(ValueError):
        triangle_count_approx(df, p=0.0)


def test_resample_forward_fill(spark):
    """Grid floored to step; latest observation per bucket wins; gaps
    carry last value; leading gaps are null; one exchange in the plan."""
    from pangool_spark.operators.windows import resample_forward_fill

    df = spark.createDataFrame(
        [("a", 103, 1.0), ("a", 131, 2.0), ("a", 133, 3.0), ("a", 170, 4.0),
         ("b", 205, 9.0)],
        "k STRING, ts LONG, v DOUBLE",
    )
    got = {(r.k, r.ts): r.v for r in resample_forward_fill(df, "k", "ts", "v", 10).collect()}
    assert got[("a", 100)] == 1.0
    assert got[("a", 110)] == 1.0 and got[("a", 120)] == 1.0  # gap filled
    assert got[("a", 130)] == 3.0  # latest in bucket (ts=133) wins
    assert got[("a", 170)] == 4.0
    assert got[("b", 200)] == 9.0 and len(got) == 9
    # explicit range extends the grid; values before first obs are null
    wide = {(r.k, r.ts): r.v for r in
            resample_forward_fill(df, "k", "ts", "v", 10, start=90, end=210).collect()}
    assert wide[("a", 90)] is None and wide[("b", 190)] is None
    assert wide[("a", 200)] == 4.0  # carried to the end of the grid
    plan = resample_forward_fill(df, "k", "ts", "v", 10)._jdf.queryExecution().executedPlan().toString()
    # bucket agg (keys+bucket), spine agg (keys), the spine join, and
    # the fill window: 4 exchanges, all over spine/bucket-sized
    # relations (never the raw event stream twice)
    assert plan.count("Exchange hashpartitioning") <= 4


def test_resample_explicit_bounds_edge_cases(spark):
    """r07 advice: (1) pre-start observations fold into the start bucket
    (the first grid rows forward-fill, not NULL); (2) a key entirely
    after an explicit end yields no rows instead of a sequence() error;
    (3) start > end raises."""
    from pangool_spark.operators.windows import resample_forward_fill

    df = spark.createDataFrame(
        [("a", 53, 7.0), ("a", 125, 8.0),   # obs before start=100 and inside
         ("c", 305, 1.0)],                  # entirely after end=200
        "k STRING, ts LONG, v DOUBLE",
    )
    got = {
        (r.k, r.ts): r.v
        for r in resample_forward_fill(
            df, "k", "ts", "v", 10, start=100, end=200
        ).collect()
    }
    # pre-start value seeds the start bucket and fills forward
    assert got[("a", 100)] == 7.0 and got[("a", 110)] == 7.0
    assert got[("a", 120)] == 8.0 and got[("a", 200)] == 8.0
    # both bounds explicit: every key gets the full grid; key c's
    # observations all land after end, so its rows are NULL
    assert got[("c", 100)] is None and got[("c", 200)] is None
    assert len(got) == 22
    # post-end clamp also holds with default start (lo>hi key filtered)
    got2 = {
        (r.k, r.ts): r.v
        for r in resample_forward_fill(df, "k", "ts", "v", 10, end=200).collect()
    }
    assert not any(k == "c" for (k, _) in got2)
    assert got2[("a", 50)] == 7.0
    with pytest.raises(ValueError, match="after end"):
        resample_forward_fill(df, "k", "ts", "v", 10, start=300, end=100)


def test_salted_and_bloom_join_column_guards(spark):
    """r07 advice: salted_join raises on a pre-existing __salt__ column
    (either side); bloom_prune_join names the side when a key column is
    absent instead of passing the dtype guard on None == None."""
    from pangool_spark.operators.joins import bloom_prune_join
    from pangool_spark.operators.partitioning import salted_join

    big = spark.createDataFrame([(1, "x")], "k LONG, a STRING")
    small = spark.createDataFrame([(1, "y")], "k LONG, b STRING")
    with pytest.raises(ValueError, match="__salt__"):
        salted_join(big.withColumn("__salt__", F.lit(0)), small, ["k"])
    with pytest.raises(ValueError, match="__salt__"):
        salted_join(big, small.withColumn("__salt__", F.lit(0)), small.columns[:1])
    with pytest.raises(ValueError, match="missing from the fact"):
        bloom_prune_join(big, small, on="b")
    with pytest.raises(ValueError, match="missing from the dim"):
        bloom_prune_join(big, small, on="a")
    with pytest.raises(ValueError, match="missing from the fact and dim"):
        bloom_prune_join(big, small, on="zz")


def test_triangle_count_approx_hash_families(spark):
    """Both hash families: p=1 degenerates to exact regardless of hash;
    at p<1 both are deterministic and estimate = sampled/p3; unknown
    family raises."""
    import random

    from pangool_spark.operators.graph import triangle_count, triangle_count_approx

    rng = random.Random(31)
    edges = list({(rng.randint(0, 18), rng.randint(0, 18)) for _ in range(110)})
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    exact = triangle_count(df).collect()[0].n_triangles
    for fam in ("fast", "portable"):
        full = triangle_count_approx(df, p=1.0, hash_family=fam).collect()[0]
        assert full.n_sampled_triangles == exact, fam
        a = triangle_count_approx(df, p=0.5, hash_family=fam).collect()[0]
        b = triangle_count_approx(df, p=0.5, hash_family=fam).collect()[0]
        assert a.n_sampled_triangles == b.n_sampled_triangles, fam
        assert a.n_triangles_est == a.n_sampled_triangles * 8.0, fam
    with pytest.raises(ValueError, match="hash_family"):
        triangle_count_approx(df, p=0.5, hash_family="sha1")


def test_bm25_search_end_to_end(spark):
    """Multi-query retrieval: per-query top-k, rank determinism, corpus
    stats shared across queries, single-query scores agree with
    bm25_score (same constants, same fold)."""
    from pangool_spark.operators.text import bm25_score, bm25_search

    docs = spark.createDataFrame(
        [
            (1, "hash join hash join hash"),
            (2, "hash table scan"),
            (3, "sort merge join sort"),
            (4, "vector filter scan scan"),
            (5, "the quick brown fox"),
        ],
        "doc_id LONG, text STRING",
    )
    queries = spark.createDataFrame(
        [(10, "hash join"), (20, "scan")], "query_id INT, query_text STRING"
    )
    got = bm25_search(docs, queries, top_k=2).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    # per-query top-k, ranks 1..k, no query exceeds k
    assert set(by_q) == {10, 20}
    for q, rows in by_q.items():
        assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2]
    # doc 5 matches nothing -> absent everywhere
    assert not any(r.doc_id == 5 for r in got)
    # single-query parity: bm25_search for one query == bm25_score
    solo = {
        r.doc_id: r.score
        for r in bm25_search(
            docs,
            spark.createDataFrame([(1, "hash join")], "query_id INT, query_text STRING"),
            top_k=10,
        ).collect()
    }
    ref = {
        r.doc_id: round(r.score, 9)
        for r in bm25_score(docs, ["hash", "join"]).collect()
    }
    assert solo == ref
    with pytest.raises(ValueError, match="top_k"):
        bm25_search(docs, queries, top_k=0)
