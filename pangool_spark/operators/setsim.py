"""Exact set-similarity join with prefix filtering (AllPairs / PPJoin:
Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
WWW 2007; Xiao, Wang, Lin & Yu, "Efficient Similarity Joins for Near
Duplicate Detection", WWW 2008) — all pairs of records whose TOKEN-SET
Jaccard similarity clears a threshold, candidates generated from an
inverted index over each record's RARE-TOKEN PREFIX only. Self-join
and cross-relation (probe × corpus) forms share one pipeline.

How it differs from the repo's other similarity joins:

- ``ngram_jaccard_pairs`` indexes EVERY distinct shingle (with a
  stop-shingle guard); ``minhash_lsh`` trades exactness for banding.
  Prefix filtering keeps exactness and indexes only the first
  |r| − ⌈t·|r|⌉ + 1 tokens of each record under a global
  rarest-first order — at t=0.8 that is ~20% of the tokens, and
  because they are the RAREST tokens their postings are the shortest:
  the candidate join's Σ df² is cut on both axes at once.

Losslessness (the PPJoin prefix lemma): order tokens by ascending
global frequency (ties by token value); if J(x, y) ≥ t then
|x∩y| ≥ t/(1+t)·(|x|+|y|) ≥ t·min(|x|,|y|), and two sets whose
prefixes are disjoint can share at most min(⌈t|x|⌉, ⌈t|y|⌉) − 1 <
t·min(|x|,|y|) tokens — so every qualifying pair shares a PREFIX
token and survives the equi-join. (For the cross form both relations
rank against ONE shared frequency order, so the lemma carries over
unchanged.) Two further lossless prunes before verification:

- length filter: J ≥ t forces t·|x| ≤ |y| (both directions);
- positional filter: positions are ranks in one GLOBAL total order,
  so the common tokens of a pair appear in the same relative order in
  both records. The globally-rarest common token is therefore the
  minimum-position prefix match on BOTH sides (it must be a
  prefix-prefix match at all — were it outside x's prefix, every
  common token would sit at position ≥ |x| − ⌈t|x|⌉ + 1, capping the
  overlap below t·|x|), and every other common token sits strictly
  after it in both records:
  |x∩y| ≤ 1 + min(|x| − min_pos_x − 1, |y| − min_pos_y − 1).

Verification is exact: candidates join their two full sorted token-HASH
arrays and count the intersection JVM-side. Token identity throughout
is xxhash64 (8-byte shuffle keys and 8-byte verify arrays — the same
digest-collision class every dedup operator documents).

Scale shape: one aggregate for token frequencies (the rarest-first
order is the distributed struct sort key (df, hash) — never a global
row_number window), one per-record-array aggregate per side, a prefix
equi-join on 8-byte keys, a pair-level aggregate applying the
positional filter, and an array verify on the surviving pairs. No
UDFs, no unbounded driver collects. Inputs scanned from few files are
conditionally repartitioned (the dedup.py idiom) so compact test
corpora don't run single-task.
"""

from __future__ import annotations


from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hashed_tokens(postings: DataFrame, id_col: str, token_col: str) -> DataFrame:
    return (
        postings.select(
            F.col(id_col).alias("__id__"),
            F.xxhash64(token_col).alias("__h__"),
        )
        .filter(F.col(token_col).isNotNull())
        .distinct()
    )


def _records(toks: DataFrame, ranked: DataFrame) -> DataFrame:
    """Per-record arrays: rarest-first struct order for the prefix,
    plain sorted hashes for the verify intersect (8 B/token, not 16)."""
    return (
        toks.join(ranked, "__h__")
        .groupBy("__id__")
        .agg(F.sort_array(F.collect_list("__r__")).alias("__rs__"))
        .select(
            "__id__",
            F.sort_array(F.transform("__rs__", lambda r: r["h"])).alias("__arr__"),
            "__rs__",
            F.size("__rs__").alias("__n__"),
        )
    )


#: All three prune thresholds compare an integer against a float
#: expression in n·t; double rounding can land the float a half-ulp
#: ABOVE the true value and prune an exactly-at-threshold pair
#: (measured: t=0.4, |x|=4, |y|=3 → α computed 2.0000000000000004 vs
#: true 2.0). Every pruning comparison therefore gets 1e-9 of slack in
#: the KEEP direction — a few spurious candidates go to the exact
#: verify (which rescreens them for free); a lost candidate is
#: unrecoverable. 1e-9 dominates the ~1e-16·(n_a+n_b) rounding scale up
#: to ~10⁷-token records.
_EPS = 1e-9


def _prefixes(rec: DataFrame, t: float) -> DataFrame:
    """Prefix stream with POSITIONS (0-based ranks in the global order)."""
    prefix_len = (
        F.col("__n__")
        - F.ceil(F.col("__n__") * F.lit(t) - F.lit(_EPS)).cast("int")
        + F.lit(1)
    )
    return rec.select(
        "__id__",
        "__n__",
        F.posexplode(F.slice("__rs__", 1, prefix_len)).alias("__pos__", "__r__"),
    ).select("__id__", "__n__", "__pos__", F.col("__r__")["h"].alias("__h__"))


def _jaccard_pairs(
    toks_a: DataFrame, toks_b: DataFrame | None, t: float
) -> DataFrame:
    """Shared pipeline. ``toks_b is None`` → self-join (pairs id_a <
    id_b within ``toks_a``); else cross join (every qualifying (a, b)
    pair, both relations ranked against ONE shared frequency order)."""
    spark = toks_a.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    cross = toks_b is not None

    # global rarest-first order WITHOUT a global row_number (a
    # partition-less window is a single-task sort — the 100 TB
    # anti-pattern): the sort key is the struct (df, token hash),
    # computed by one distributed aggregate and joined back.
    universe = toks_a.unionByName(toks_b) if cross else toks_a
    freq = universe.groupBy("__h__").agg(F.count(F.lit(1)).alias("__df__"))
    ranked = freq.select(
        "__h__",
        F.struct(F.col("__df__").alias("d"), F.col("__h__").alias("h")).alias(
            "__r__"
        ),
    )
    # The record-array relation feeds FOUR plan branches in the self-join
    # (both prefix streams + both verify sides) and two per side in the
    # cross form; without materialization Catalyst re-inlines the whole
    # tokenize→distinct→freq→collect pipeline per branch (measured: 16-24
    # parquet scans, 46-54 Exchanges in one plan). One eager checkpoint
    # per side collapses that to one upstream pass (guide §1.3/§5); the
    # relation is the verify-side sorted hash arrays — O(corpus tokens),
    # so it takes the durable path when a checkpoint dir is configured.
    from pangool_spark.data import checkpoint_eager

    rec_a = checkpoint_eager(_records(toks_a, ranked), reliable_ok=True)
    rec_b = (
        checkpoint_eager(_records(toks_b, ranked), reliable_ok=True)
        if cross
        else rec_a
    )

    pa = _prefixes(rec_a, t).select(
        F.col("__id__").alias("id_a"),
        F.col("__n__").alias("__na__"),
        F.col("__pos__").alias("__pa__"),
        "__h__",
    )
    pb = _prefixes(rec_b, t).select(
        F.col("__id__").alias("id_b"),
        F.col("__n__").alias("__nb__"),
        F.col("__pos__").alias("__pb__"),
        "__h__",
    )
    na, nb = F.col("__na__"), F.col("__nb__")
    pair_pred = F.lit(True) if cross else (F.col("id_a") < F.col("id_b"))
    candidates = (
        pa.join(pb, "__h__")
        .filter(
            pair_pred
            # length filter: J >= t forces t*|x| <= |y| (both directions;
            # _EPS slack keeps exactly-at-threshold pairs — module note)
            & (na * F.lit(t) - F.lit(_EPS) <= nb)
            & (nb * F.lit(t) - F.lit(_EPS) <= na)
        )
        .groupBy("id_a", "id_b", "__na__", "__nb__")
        .agg(F.min("__pa__").alias("__ma__"), F.min("__pb__").alias("__mb__"))
        # positional filter (module docstring): overlap <= 1 + the
        # min remaining length after the rarest shared prefix token
        .filter(
            (
                F.lit(1)
                + F.least(na - F.col("__ma__") - 1, nb - F.col("__mb__") - 1)
            ).cast("double")
            >= F.lit(t / (1.0 + t)) * (na + nb).cast("double") - F.lit(_EPS)
        )
        .select("id_a", "id_b")
    )
    # The verify intersect is CPU-bound on tiny BYTES: AQE's byte-based
    # coalescing would run it in one task on a compact corpus. A user
    # repartition is never coalesced, and with the record-array side
    # broadcast (AQE picks it whenever rec fits) the intersect executes
    # in exactly these partitions. Cost at scale: one shuffle of slim
    # (id, id) pairs — noise next to the verify itself.
    candidates = candidates.repartition(n_parts, "id_a")

    # exact verify on the full sorted hash arrays
    ra = rec_a.select(
        F.col("__id__").alias("id_a"),
        F.col("__arr__").alias("__aa__"),
        F.col("__n__").alias("__va__"),
    )
    rb = rec_b.select(
        F.col("__id__").alias("id_b"),
        F.col("__arr__").alias("__ab__"),
        F.col("__n__").alias("__vb__"),
    )
    inter = F.size(F.array_intersect("__aa__", "__ab__"))
    return (
        candidates.join(ra, "id_a")
        .join(rb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                inter.cast("double")
                / (F.col("__va__") + F.col("__vb__") - inter).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t)
    )


def jaccard_postings_selfjoin(
    postings: DataFrame,
    id_col: str = "id",
    token_col: str = "token",
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs (id_a < id_b) with token-set Jaccard ≥ ``threshold``,
    from an EXPLODED postings relation (one row per record-token —
    e.g. ``dedup.shingles`` output, already NGram-vectorized and
    hash-keyed). Duplicate (id, token) rows are collapsed (set
    semantics). Output: (id_a, id_b, jaccard).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    return _jaccard_pairs(
        _hashed_tokens(postings, id_col, token_col), None, float(threshold)
    )


def jaccard_postings_join(
    probe: DataFrame,
    corpus: DataFrame,
    id_col: str = "id",
    token_col: str = "token",
    threshold: float = 0.5,
) -> DataFrame:
    """Cross-relation form — every (probe record, corpus record) pair
    with Jaccard ≥ ``threshold``: the "which of today's documents
    near-duplicate the standing corpus" shape (the setsim sibling of
    ``minhash_lsh_against`` / ``ngram_jaccard_against``, exact instead
    of banded). Both relations share one frequency order, so the prefix
    lemma and both prunes stay lossless. Output: (id_a = probe id,
    id_b = corpus id, jaccard) — ids may collide across relations
    (they are different keyspaces); disambiguation is the caller's.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    return _jaccard_pairs(
        _hashed_tokens(probe, id_col, token_col),
        _hashed_tokens(corpus, id_col, token_col),
        float(threshold),
    )


def jaccard_selfjoin(
    df: DataFrame,
    id_col: str = "id",
    tokens_col: str = "tokens",
    threshold: float = 0.5,
) -> DataFrame:
    """Array-column form of ``jaccard_postings_selfjoin``: ``tokens_col``
    is an array; duplicates within a record are collapsed (set
    semantics); records with empty token sets match nothing."""
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n_parts:
        # compact sources otherwise explode + verify in too few tasks
        # (the dedup.shingles idiom)
        df = df.repartition(n_parts, F.col(id_col))
    postings = df.select(
        F.col(id_col).alias("__pid__"),
        F.explode(F.array_distinct(tokens_col)).alias("__ptok__"),
    )
    return jaccard_postings_selfjoin(postings, "__pid__", "__ptok__", threshold)


def jaccard_text_selfjoin(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Convenience form over raw text: normalized whitespace tokens
    (the repo-wide ``normalized_tokens`` contract) → ``jaccard_selfjoin``."""
    from pangool_spark.operators.norm import normalized_tokens

    return jaccard_selfjoin(
        df.select(F.col(id_col), normalized_tokens(text_col).alias("__toks__")),
        id_col,
        "__toks__",
        threshold,
    )


def containment_join(
    probe: DataFrame,
    corpus: DataFrame,
    id_col: str = "id",
    token_col: str = "token",
    threshold: float = 0.5,
) -> DataFrame:
    """Asymmetric CONTAINMENT join: every (probe, corpus) pair with
    ``|A∩B| / |A| ≥ threshold`` (A = probe record's token set) — the
    quote/subset detector: "is this document mostly contained in some
    corpus document", which Jaccard misses when |B| ≫ |A| (a full
    containment of a tweet in a book scores near-zero Jaccard).

    Prefix lemma, containment form: i ≥ t·|A| depends only on A, so if
    none of A's prefix tokens (first |A| − ⌈t|A|⌉ + 1 under the shared
    rarest-first order) appears ANYWHERE in B, then
    i ≤ |A| − p_A = ⌈t|A|⌉ − 1 < t·|A| — every qualifying pair shares
    a token between A's PREFIX and B's FULL posting list. The corpus
    side therefore indexes fully (no length filter exists: B may be
    arbitrarily large), but the probe prefix is rare-token-short, so
    the candidate join is Σ over probe prefix tokens of df_corpus —
    the same inverted-index bill as ``ngram_jaccard_against``, cut by
    the prefix. The positional prune mirrors the symmetric one on the
    probe side only: i ≤ 1 + (|A| − min_prefix_pos − 1). Verification
    is the exact hash-array intersect. Pruning comparisons carry the
    module's _EPS keep-direction slack.

    Output: (id_a = probe id, id_b = corpus id, containment).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t = float(threshold)
    toks_a = _hashed_tokens(probe, id_col, token_col)
    toks_b = _hashed_tokens(corpus, id_col, token_col)
    n_parts = toks_a.sparkSession.sparkContext.defaultParallelism

    universe = toks_a.unionByName(toks_b)
    freq = universe.groupBy("__h__").agg(F.count(F.lit(1)).alias("__df__"))
    ranked = freq.select(
        "__h__",
        F.struct(F.col("__df__").alias("d"), F.col("__h__").alias("h")).alias(
            "__r__"
        ),
    )
    # materialize-once: same re-inlining bill as _jaccard_pairs (the probe
    # records feed prefix + verify, the corpus records verify + the full
    # posting probe side reads toks_b separately)
    from pangool_spark.data import checkpoint_eager

    rec_a = checkpoint_eager(_records(toks_a, ranked), reliable_ok=True)
    rec_b = checkpoint_eager(_records(toks_b, ranked), reliable_ok=True)

    pa = _prefixes(rec_a, t).select(
        F.col("__id__").alias("id_a"),
        F.col("__n__").alias("__na__"),
        F.col("__pos__").alias("__pa__"),
        "__h__",
    )
    # corpus side: FULL posting list (sizes ride along for the verify)
    pb = toks_b.select(F.col("__id__").alias("id_b"), "__h__")
    na = F.col("__na__")
    candidates = (
        pa.join(pb, "__h__")
        .groupBy("id_a", "id_b", "__na__")
        .agg(F.min("__pa__").alias("__ma__"))
        # probe-side positional prune: common tokens all sit at or after
        # the rarest shared one in A's order
        .filter(
            (F.lit(1) + (na - F.col("__ma__") - 1)).cast("double")
            >= F.lit(t) * na.cast("double") - F.lit(_EPS)
        )
        .select("id_a", "id_b")
    )
    candidates = candidates.repartition(n_parts, "id_a")

    ra = rec_a.select(
        F.col("__id__").alias("id_a"),
        F.col("__arr__").alias("__aa__"),
        F.col("__n__").alias("__va__"),
    )
    rb = rec_b.select(
        F.col("__id__").alias("id_b"), F.col("__arr__").alias("__ab__")
    )
    inter = F.size(F.array_intersect("__aa__", "__ab__"))
    return (
        candidates.join(ra, "id_a")
        .join(rb, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter.cast("double") / F.col("__va__").cast("double")).alias(
                "containment"
            ),
        )
        .filter(F.col("containment") >= t)
    )
