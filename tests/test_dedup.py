"""Dedup operator semantics on planted duplicates."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("lazy", "sleepy")),  # near dup of 1
        (4, "completely different content about spark engines and parquet files"),
        (5, "THE   quick brown fox jumps over the lazy dog again and again today"),  # case/ws dup
        (6, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_exact_dedup_normalizes_case_and_whitespace(docs):
    out = exact_dedup(docs)
    ids = sorted(r.doc_id for r in out.select("doc_id").collect())
    # 1,2,5 collapse to 1; 3,4,6 survive
    assert ids == [1, 3, 4, 6]


def test_shingles_short_doc(docs):
    sh = shingles(docs.filter(F.col("doc_id") == 6), n=3)
    got = [r.shingle for r in sh.collect()]
    assert got == ["short doc"]


def test_ngram_jaccard_finds_near_dups(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.4).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 5) in pairs and pairs[(1, 5)] == 1.0
    assert (1, 3) in pairs and 0.4 <= pairs[(1, 3)] < 1.0
    assert not any({a, b} & {4} for a, b in pairs)


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs and (1, 5) in pairs and (2, 5) in pairs
    assert (1, 3) in pairs  # near dup: most shingles shared
    assert not any({a, b} & {4} for a, b in pairs)


def test_simhash_identical_for_dups(docs):
    fps = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert fps[1] == fps[2] == fps[5]


def test_simhash_pairs_blocking(docs):
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 5)] == 0
    assert (1, 4) not in pairs


def test_embedding_cosine_dups(spark):
    from pangool_spark.operators.dedup import embedding_cosine_dups

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),  # near dup of 1
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    pairs = {(r.id_a, r.id_b) for r in embedding_cosine_dups(emb, threshold=0.95).collect()}
    assert pairs == {(1, 2)}


def test_embedding_dups_lsh_recall_matches_exact(spark, sf_dir):
    # The catalog routes embedding_cosine_dups through auto-param sign-LSH
    # candidates + exact verify; on the fixture the result must EQUAL the
    # brute-force pairs (recall 1.0 at the oracle threshold).
    from pangool_spark.operators.dedup import embedding_cosine_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r.id_a, r.id_b) for r in embedding_cosine_dups(emb, threshold=0.4, method="exact").collect()}
    lsh = {(r.id_a, r.id_b) for r in embedding_cosine_dups(emb, threshold=0.4, method="lsh").collect()}
    assert lsh == exact and exact


def test_embedding_dups_lsh_plan_has_no_cartesian(spark, sf_dir):
    from pangool_spark.operators.dedup import embedding_cosine_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = (
        embedding_cosine_dups(emb, threshold=0.4, method="lsh")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_embedding_dups_strategy_selection():
    # auto routes by threshold tier: LSH only where its collision model
    # prunes (t >= 0.8); blocked exact matmul in the degenerate regime.
    from pangool_spark.operators.dedup import choose_embedding_dedup_method

    assert choose_embedding_dedup_method(0.4) == "blocked"
    assert choose_embedding_dedup_method(0.6) == "blocked"
    assert choose_embedding_dedup_method(0.79) == "blocked"
    assert choose_embedding_dedup_method(0.8) == "lsh"
    assert choose_embedding_dedup_method(0.95) == "lsh"


def test_embedding_dups_blocked_matches_exact(spark, sf_dir):
    # The blocked matmul is exact by construction: at any block count the
    # pair set must EQUAL brute force (recall and precision 1.0).
    from pangool_spark.operators.dedup import embedding_cosine_dups
    from pangool_spark.operators.similarity import blocked_cosine_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_cosine_dups(emb, threshold=0.4, method="exact").collect()
    }
    # force multiple blocks so cross-block and self-block paths both run
    blocked = {
        (r.id_a, r.id_b)
        for r in blocked_cosine_pairs(emb, threshold=0.4, rows_per_block=100).collect()
    }
    assert blocked == exact and exact


def test_embedding_dups_blocked_plan_has_no_join(spark, sf_dir):
    # The blocked path is explode + ONE hash exchange + grouped map: no join
    # operator of any kind appears in the physical plan.
    from pangool_spark.operators.dedup import embedding_cosine_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = (
        embedding_cosine_dups(emb, threshold=0.4, method="auto")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_auto_lsh_params_tiers():
    from pangool_spark.operators.similarity import auto_lsh_params

    lo_planes, lo_tables = auto_lsh_params(0.4, target_miss=1e-6)
    hi_planes, hi_tables = auto_lsh_params(0.95, target_miss=1e-6)
    # low thresholds -> few planes (recall), high thresholds -> more planes
    # (selectivity); both must bound the per-pair miss at the target.
    import math

    for t, (planes, tables) in ((0.4, (lo_planes, lo_tables)), (0.95, (hi_planes, hi_tables))):
        p = 1.0 - math.acos(t) / math.pi
        assert (1.0 - p**planes) ** tables <= 1e-6
    assert lo_planes < hi_planes


def test_hot_shingle_df_pruning(spark):
    # Docs 1..4 all share one boilerplate sentence (a hot shingle source);
    # docs 1,2 additionally share distinctive content. With max_df=3 the
    # boilerplate shingles (df=4) are pruned: pairs that share ONLY
    # boilerplate disappear, and Jaccard is computed over the pruned
    # shingle universe.
    boiler = "subscribe to our newsletter for updates every single day"
    rows = [
        (1, boiler + " alpha beta gamma delta epsilon zeta"),
        (2, boiler + " alpha beta gamma delta epsilon eta"),
        (3, boiler + " totally unrelated text about volcanoes erupting"),
        (4, boiler + " another unrelated passage about deep sea fish"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    unpruned = {
        (r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    # boilerplate alone pushes every pair over the threshold
    assert (3, 4) in unpruned and (1, 3) in unpruned

    pruned = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.3, max_df=3).collect()
    }
    # only the genuinely-similar pair survives, scored on distinctive content
    assert set(pruned) == {(1, 2)}
    assert 0.3 <= pruned[(1, 2)] < 1.0


def test_prune_hot_shingles_bounds_fanout(spark):
    from pangool_spark.operators.dedup import prune_hot_shingles

    sh = shingles(
        spark.createDataFrame(
            [(i, "common phrase here plus word%d" % i) for i in range(10)],
            "doc_id LONG, text STRING",
        )
    )
    pruned = prune_hot_shingles(sh, max_df=5)
    df_counts = (
        pruned.groupBy("shingle").count().agg(F.max("count").alias("m")).collect()[0].m
    )
    assert df_counts <= 5
    # the skew-safe agg strategy (map-side partial count + broadcast
    # anti-join) must keep exactly the same rows as the windowed form
    agg_pruned = prune_hot_shingles(sh, max_df=5, strategy="agg")
    window_rows = {tuple(r) for r in pruned.collect()}
    agg_rows = {tuple(r) for r in agg_pruned.collect()}
    assert agg_rows == window_rows
    import pytest

    with pytest.raises(ValueError, match="unknown prune strategy"):
        prune_hot_shingles(sh, max_df=5, strategy="salted")


def test_ngram_pairs_prune_is_agg_shaped(spark):
    # r12 skew guard: the max_df prune inside ngram_jaccard_pairs must be
    # the agg strategy — map-side-combined df counts + a broadcast
    # anti-join — NOT a whole-partition window over `shingle`, which ships
    # every occurrence of the hottest stop-shingle (the exact keys max_df
    # removes) to one task.
    docs = spark.createDataFrame(
        [(i, "shared words everywhere plus token%d" % i) for i in range(6)],
        "doc_id LONG, text STRING",
    )
    pairs = ngram_jaccard_pairs(docs, threshold=0.3, max_df=3)
    plan = pairs._sc._jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan
    assert "LeftAnti" in plan


def test_minhash_signature_matches_duckdb_oracle(spark):
    # The md5-derived base hash + fixed coefficients make signatures
    # replicable in DuckDB — the property the driver oracle relies on.
    import duckdb

    from pangool_spark.operators.dedup import (
        MINHASH_PRIME,
        minhash_coefficients,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "one two three four five six"), (2, "seven eight nine ten")],
        "doc_id LONG, text STRING",
    )
    sig = {r.doc_id: r.signature for r in minhash_signatures(docs, num_hashes=8).collect()}

    a, b = minhash_coefficients(8)
    sh = [(r.doc_id, r.shingle) for r in shingles(docs).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE sh (doc_id BIGINT, shingle VARCHAR)")
    con.executemany("INSERT INTO sh VALUES (?, ?)", sh)
    mins = ", ".join(
        f"MIN(({int(a[i])} * x + {int(b[i])}) % {MINHASH_PRIME})" for i in range(8)
    )
    rows = con.execute(
        "SELECT doc_id, " + mins + " FROM (SELECT doc_id,"
        " ('0x' || substr(md5(shingle), 1, 8))::BIGINT & 2147483647 AS x FROM sh)"
        " GROUP BY doc_id"
    ).fetchall()
    for row in rows:
        assert list(row[1:]) == sig[row[0]], f"doc {row[0]} signature mismatch"


def test_minhash_params_for_threshold():
    from pangool_spark.operators.dedup import minhash_params_for_threshold

    # low threshold -> many narrow bands (recall); high -> few wide bands
    b_lo, r_lo = minhash_params_for_threshold(0.3, 64)
    b_hi, r_hi = minhash_params_for_threshold(0.9, 64)
    assert b_lo > b_hi and r_lo < r_hi
    assert b_lo * r_lo == 64 and b_hi * r_hi == 64
    # the chosen S-curve inflection lands near the target
    for t, (b, r) in ((0.3, (b_lo, r_lo)), (0.9, (b_hi, r_hi))):
        assert abs((1.0 / b) ** (1.0 / r) - t) < 0.15


def test_kmv_sketch_accuracy(spark, sf_dir):
    # KMV(k=64) stderr ~ 1/sqrt(62) ~ 12.7%; assert within 3 sigma of exact
    import duckdb

    from pangool_spark.queries import QUERIES

    est = {r.l_returnflag: r.est_parts for r in QUERIES["kmv_distinct_parts"](spark, sf_dir).collect()}
    con = duckdb.connect()
    exact = dict(
        con.sql(
            f"SELECT l_returnflag, COUNT(DISTINCT l_partkey) FROM '{sf_dir}/lineitem.parquet' GROUP BY 1"
        ).fetchall()
    )
    for flag, n in exact.items():
        assert abs(est[flag] - n) <= max(0.4 * n, 5), (flag, est[flag], n)


def test_minhash_fast_hash_family(spark):
    # 'fast' (xxhash64) signatures: same shape/banding, identical docs get
    # identical signatures, and obvious near-dups still pair. Not oracled
    # (not reproducible outside Spark) - that is what 'portable' is for.
    import pytest

    from pangool_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures

    base = "the quick brown fox jumps over the lazy dog again and again "
    docs = spark.createDataFrame(
        [
            (1, base * 4),
            (2, base * 4),  # exact duplicate of 1
            (3, base * 4 + "with a tiny tail difference"),
            (4, "completely different material about spark shuffles and joins " * 4),
        ],
        "doc_id LONG, text STRING",
    )
    sigs = {
        r.doc_id: tuple(r.signature)
        for r in minhash_signatures(docs, hash_family="fast").collect()
    }
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, threshold=0.5, hash_family="fast").collect()
    }
    assert (1, 2) in pairs
    assert (1, 4) not in pairs and (2, 4) not in pairs and (3, 4) not in pairs

    with pytest.raises(ValueError, match="hash_family"):
        minhash_signatures(docs, hash_family="nope").collect()


def test_decontaminate_drops_overlapping_docs(spark):
    from pangool_spark.operators.dedup import contamination_overlap, decontaminate

    bench = spark.createDataFrame(
        [(100, "the capital of france is paris obviously")],
        "qid LONG, text STRING",
    )
    docs = spark.createDataFrame(
        [
            (1, "quiz answer: the capital of france is paris obviously check"),
            (2, "a completely unrelated document about spark shuffles and joins"),
            (3, "france is lovely in spring"),  # shares < min_overlap 3-grams
        ],
        "doc_id LONG, text STRING",
    )
    overlap = {
        r.doc_id: r.n_overlap
        for r in contamination_overlap(docs, bench, n=3).collect()
    }
    assert overlap[1] >= 4 and 2 not in overlap
    out = decontaminate(docs, bench, n=3, min_overlap=3)
    assert sorted(r.doc_id for r in out.select("doc_id").collect()) == [2, 3]
    # survivors keep the full input schema
    assert out.columns == docs.columns


def test_decontaminate_broadcast_plan(spark):
    from pangool_spark.operators.dedup import contamination_overlap

    bench = spark.createDataFrame([(1, "a b c d e f")], "qid LONG, text STRING")
    docs = spark.createDataFrame([(1, "a b c d e f g")], "doc_id LONG, text STRING")
    plan = contamination_overlap(docs, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # shuffle-join fallback for huge benchmark sets
    plan2 = contamination_overlap(
        docs, bench, n=3, broadcast_benchmark=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan2 or "SortMergeJoin" in plan2


def test_semantic_dedup_within_cluster_only(spark):
    from pangool_spark.operators.dedup import semantic_dedup

    # two orthogonal 4-d cells; vec 1≈2 in cell 0, vec 10 alone in cell 1,
    # vec 3 in cell 0 but dissimilar to 1/2
    centroids = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    rows = [
        (1, [1.0, 0.1, 0.0, 0.0]),
        (2, [1.0, 0.11, 0.0, 0.0]),   # dup of 1 → dropped (higher id)
        (3, [0.6, 0.0, 0.8, 0.0]),    # cell 0 but cosine(1,3) ≈ 0.6
        (10, [0.1, 1.0, 0.0, 0.0]),   # cell 1, survives
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = semantic_dedup(df, centroids, threshold=0.95)
    assert sorted(r.vec_id for r in out.select("vec_id").collect()) == [1, 3, 10]
    assert out.columns == df.columns


def test_semantic_dedup_no_cartesian(spark):
    from pangool_spark.operators.dedup import semantic_dedup

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    plan = semantic_dedup(df, [[1.0, 0.0], [0.0, 1.0]], 0.99)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_incremental_dedup_against_corpus(spark):
    from pangool_spark.operators.dedup import incremental_dedup, ngram_jaccard_against

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "completely different historical document about query planning"),
        ],
        "doc_id LONG, text STRING",
    )
    batch = spark.createDataFrame(
        [
            (10, "THE  quick brown fox jumps over the lazy dog again today"),  # exact dup (normalized)
            (11, "the quick brown fox jumps over the sleepy dog again today"), # near dup of 1
            (12, "a brand new document with entirely novel content and words"),
        ],
        "doc_id LONG, text STRING",
    )
    out = incremental_dedup(batch, corpus, threshold=0.5)
    assert sorted(r.doc_id for r in out.collect()) == [12]
    assert out.columns == batch.columns
    # the pair stage reports which corpus doc the near-dup hit
    pairs = ngram_jaccard_against(batch, corpus, threshold=0.5).collect()
    assert {(p.id_new, p.id_ref) for p in pairs} >= {(11, 1)}
    assert all(0 < p.jaccard <= 1 for p in pairs)


def test_incremental_dedup_with_persisted_index(spark):
    from pangool_spark.operators.dedup import incremental_dedup, shingles
    from pangool_spark.operators.norm import content_digest

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "completely different historical document about query planning"),
        ],
        "doc_id LONG, text STRING",
    )
    batch = spark.createDataFrame(
        [
            (10, "THE  quick brown fox jumps over the lazy dog again today"),
            (11, "the quick brown fox jumps over the sleepy dog again today"),
            (12, "a brand new document with entirely novel content and words"),
        ],
        "doc_id LONG, text STRING",
    )
    # persisted-index path: digests + shingle index computed once up front
    seen = corpus.select(content_digest("text").alias("__digest__")).distinct()
    idx = shingles(corpus, hashed=True)
    via_index = incremental_dedup(
        batch, corpus, threshold=0.5, seen_digests=seen, ref_shingles=idx
    )
    assert sorted(r.doc_id for r in via_index.collect()) == [12]


def test_incremental_dedup_index_lifecycle_across_batches(spark, tmp_path):
    """The operational loop: persist the standing digest+shingle index,
    reload it, ingest batch 1, APPEND the admitted rows' index entries,
    then ingest batch 2 — a batch-2 doc duplicating an ADMITTED batch-1
    doc must be caught by the appended index without ever re-reading the
    corpus text."""
    import os

    from pangool_spark.operators.dedup import incremental_dedup, shingles
    from pangool_spark.operators.norm import content_digest
    from pangool_spark.sources.tuplefile import read_tuples, write_tuples

    dig_path = os.path.join(str(tmp_path), "digests")
    idx_path = os.path.join(str(tmp_path), "shingle_index")

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again today")],
        "doc_id LONG, text STRING",
    )
    write_tuples(
        corpus.select(content_digest("text").alias("__digest__")).distinct(), dig_path
    )
    write_tuples(shingles(corpus, hashed=True), idx_path)

    def ingest(batch):
        seen = read_tuples(spark, dig_path)
        idx = read_tuples(spark, idx_path)
        admitted = incremental_dedup(
            batch, corpus, threshold=0.5, seen_digests=seen, ref_shingles=idx
        ).localCheckpoint(eager=True)  # MATERIALIZE before appending: the
        # plan lazily re-reads the index paths, so writing first would make
        # each admitted row anti-join against its own freshly-written digest
        # append the admitted rows' index entries for the next batch
        write_tuples(
            admitted.select(content_digest("text").alias("__digest__")).distinct(),
            dig_path, mode="append",
        )
        write_tuples(shingles(admitted, hashed=True), idx_path, mode="append")
        return sorted(r.doc_id for r in admitted.collect())

    batch1 = spark.createDataFrame(
        [(10, "a totally new training document about shuffle planning")],
        "doc_id LONG, text STRING",
    )
    assert ingest(batch1) == [10]

    batch2 = spark.createDataFrame(
        [
            (20, "A totally NEW training document about shuffle planning"),  # exact dup of 10
            (21, "a totally new training document about shuffle exchanges"), # near dup of 10
            (22, "something else entirely unrelated to anything prior"),
        ],
        "doc_id LONG, text STRING",
    )
    assert ingest(batch2) == [22]


def test_minhash_lsh_against_equals_self_join_cross_pairs(spark):
    """Cross-relation banding must agree exactly with the oracled self-join
    form restricted to (batch, corpus) pairs — same signatures, same bands,
    same estimate."""
    from pangool_spark.operators.dedup import (
        minhash_lsh_against,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(1, base), (2, "ancient unrelated text about btree indexes and vacuum")],
        "doc_id LONG, text STRING",
    )
    batch = spark.createDataFrame(
        [(10, base.replace("lazy", "sleepy")), (11, "wholly novel content here")],
        "doc_id LONG, text STRING",
    )
    ref_sigs = minhash_signatures(corpus)
    got = {
        (r.id_new, r.id_ref): round(r.est_jaccard, 9)
        for r in minhash_lsh_against(batch, ref_sigs, threshold=0.3).collect()
    }
    both = corpus.unionByName(batch)
    expected = {
        (r.id_b, r.id_a): round(r.est_jaccard, 9)
        for r in minhash_lsh_pairs(both, threshold=0.3).collect()
        if r.id_a <= 2 and r.id_b >= 10  # cross pairs only (id_a < id_b)
    }
    assert got == expected and (10, 1) in got

    # wrong-num_hashes index RAISES: a silently-dropped mismatch would
    # empty the pair set and admit every duplicate
    short_sigs = minhash_signatures(corpus, num_hashes=32)
    with pytest.raises(Exception, match="num_hashes"):
        minhash_lsh_against(batch, short_sigs, num_hashes=64).count()


def test_novelty_score_reference_parity(spark):
    from pangool_spark.operators.dedup import novelty_score

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),       # grams: "a b c", "b c d"
            (2, "a b c x y"),     # one seen ("a b c"), two new
            (3, "p q r s"),       # all new
            (4, "  "),            # no shingles -> absent
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(100, "z a b c d z")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_seen"], r["novelty"])
        for r in novelty_score(docs, ref, n=3).collect()
    }
    assert got[1] == (2, 2, 0.0)                      # fully seen
    assert got[3] == (2, 0, 1.0)                      # fully novel
    n, s, nov = got[2]
    assert (n, s) == (3, 1) and nov == 1.0 - 1.0 / 3.0
    assert 4 not in got
    # shuffle-join fallback path identical
    got2 = {
        r["doc_id"]: (r["n_shingles"], r["n_seen"], r["novelty"])
        for r in novelty_score(docs, ref, n=3, broadcast_reference=False).collect()
    }
    assert got2 == got
