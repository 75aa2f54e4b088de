"""Deduplication operators for large-scale corpus curation.

Extension over the reference (SURVEY §7.0 layer 3). Scale discipline:

- Exact dedup shuffles a 16-byte digest, never full documents.
- MinHash/SimHash signatures are computed with native expressions (xxhash64 /
  md5 + bit ops) — no Python in the row path.
- Near-dup candidate generation is a *band-bucket equi-join* (LSH), so the
  all-pairs O(n²) never materializes; at 1000 executors the bucket join
  shuffles only (band_hash → doc) pairs, and AQE handles hot buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pangool_spark.operators.norm import content_digest, normalized_tokens

# Every intermediate these operators cache (shingle relations, signatures,
# candidate pairs) is registered here so long-lived sessions can evict them:
# the daily-ingest loop calls an operator like ngram_jaccard_against once per
# batch, and without eviction each batch's cached relations accumulate in
# executor storage memory for the life of the session. Callers should invoke
# ``release_caches()`` after consuming a returned DataFrame (materialize
# first — the returned plan READS these caches, so releasing early just
# recomputes). ``queries.clear_shingle_cache`` calls this too.
#
# Registry is keyed per SparkSession so two sessions sharing this module
# (e.g. test fixtures, notebook + scheduled job in one process) cannot
# evict each other's intermediates; a lock guards the list mutations so
# concurrent threads don't race ``release_caches`` against ``_cache``.
import threading as _threading

_CACHE_LOCK = _threading.Lock()
_ACTIVE_CACHES: dict = {}  # session id -> list[DataFrame]


def _session_key(df: DataFrame):
    try:
        return id(df.sparkSession)
    except Exception:
        return None


def _cache(df: DataFrame) -> DataFrame:
    """cache + register for ``release_caches`` eviction."""
    cached = df.cache()
    with _CACHE_LOCK:
        _ACTIVE_CACHES.setdefault(_session_key(df), []).append(cached)
    return df


def release_caches(session=None) -> int:
    """Unpersist intermediates cached by dedup operators in this process.

    ``session=None`` (the historical behavior) evicts across ALL sessions;
    pass a ``SparkSession`` to release only that session's registrations.
    Returns the number of relations evicted. Safe to call with a stopped
    session."""
    with _CACHE_LOCK:
        if session is None:
            doomed = [df for dfs in _ACTIVE_CACHES.values() for df in dfs]
            _ACTIVE_CACHES.clear()
        else:
            doomed = _ACTIVE_CACHES.pop(id(session), [])
    for df in doomed:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped; nothing to unpersist
    return len(doomed)


def shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3,
    hashed: bool = False,
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Normalization: lowercase, collapse whitespace. Documents with fewer than
    ``n`` words yield their whole token string as one shingle so they still
    participate.

    ``hashed=True`` replaces the shingle STRING with its xxhash64 before
    the distinct, so the dedup pipeline's first shuffle moves (id, 8-byte
    long) instead of (id, 20-40-byte string) — corpus text never shuffles
    at all. Right for Jaccard-style consumers (joins/counts only need
    equality); keep strings when downstream needs the text itself, e.g.
    the md5-portable MinHash signatures. Collision effect mirrors the
    pair join's: two distinct shingles merging is an off-by-one in one
    intersection/size count, ~3% chance of ONE collision at 10^9 distinct
    shingles."""
    from pyspark.ml.feature import NGram

    tokens = normalized_tokens(text_col)
    # Spread the explode fan-out across the cluster BEFORE it happens: a
    # compact source (few parquet files) otherwise runs the whole shingle
    # generation in as many tasks as input splits. Only when needed —
    # when the scan already has ≥ cluster parallelism (the normal 100 TB
    # case: thousands of splits), repartitioning here would shuffle the
    # full corpus TEXT for nothing.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n_parts:
        df = df.repartition(n_parts, F.col(id_col))
    toks = df.select(F.col(id_col), tokens.alias("__tokens__"))
    # MLlib NGram (JVM sliding window) instead of a transform/slice/concat
    # HOF pipeline: same output, but the HOF form compiles into a fused
    # megamethod with erratic interpret-vs-JIT behavior; NGram is a plain
    # Scala UDF that JITs predictably (measured 0.8s vs 2-50s at sf0.1).
    grams = NGram(n=n, inputCol="__tokens__", outputCol="__grams__").transform(toks)
    exploded = grams.select(
        F.col(id_col),
        F.explode(
            F.when(F.size("__grams__") > 0, F.col("__grams__")).otherwise(
                F.array(F.concat_ws(" ", "__tokens__"))
            )
        ).alias("shingle"),
    ).filter(F.col("shingle") != "")
    if hashed:
        exploded = exploded.select(
            F.col(id_col), F.xxhash64("shingle").alias("shingle")
        )
    return exploded.distinct()


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", keep: str = "min"
) -> DataFrame:
    """Exact duplicate removal on normalized content digest.

    Hash-groupBy on md5(normalized text): one shuffle of (digest, id), the
    representative is the min (or max) id. Returns the surviving rows of
    ``df``.
    """
    digest = content_digest(text_col).alias("__digest__")
    keep_fn = F.min if keep == "min" else F.max
    reps = (
        df.select(digest, F.col(id_col))
        .groupBy("__digest__")
        .agg(keep_fn(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(reps, on=id_col, how="left_semi")


def exact_dedup_by(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``exact_dedup`` with QUALITY-AWARE survivor selection: each
    duplicate group keeps the row with the highest ``score_col`` (ties,
    and null scores, break to the min id — total and engine-replicable).
    "Keep the best copy, not the first copy": exact duplicates routinely
    differ in the metadata that matters downstream (source reliability,
    crawl recency, quality score), and id-order survival throws that
    signal away.

    Same scale shape as ``exact_dedup``: one map-side-combined aggregate
    over (digest, score, id) — ``max_by`` with an explicit (score, -id)
    ordering struct — then a semi-join. Scores never shuffle with the
    text.
    """
    id_type = dict(df.dtypes)[id_col]
    if not any(id_type.startswith(t) for t in ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")):
        raise ValueError(
            f"exact_dedup_by needs a numeric id for the min-id tie-break, "
            f"got {id_col}: {id_type}"
        )
    digest = content_digest(text_col).alias("__digest__")
    # max over a (score, negated id) struct = argmax score, ties -> min id;
    # null scores sort before any non-null struct, so a scored copy always
    # beats an unscored one
    ranked = F.struct(
        F.col(score_col).alias("s"), (-F.col(id_col)).alias("ni")
    )
    reps = (
        df.select(digest, F.col(id_col), ranked.alias("__r__"))
        .groupBy("__digest__")
        .agg(F.max_by(id_col, F.col("__r__")).alias(id_col))
        .select(id_col)
    )
    return df.join(reps, on=id_col, how="left_semi")


def windowed_dedup(
    df: DataFrame,
    keys: "Sequence[str]",
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    tiebreak_cols: "Sequence[str]" = (),
) -> DataFrame:
    """Event-time WINDOWED deduplication: within each tumbling
    event-time window, keep exactly one row per key — the earliest by
    (``ts_col``, then ``tiebreak_cols``). The batch twin of
    ``streaming.stream_dedup``: ``dropDuplicatesWithinWatermark`` keeps
    the first ARRIVAL inside a rolling horizon (arrival order is not
    replayable, so it can't be value-oracled), while this keeps the
    first EVENT-TIME row inside epoch-aligned windows — deterministic,
    hence a full DuckDB value oracle. The operating difference matters:
    a key that re-fires every window SURVIVES once per window here
    (heartbeat thinning, at-most-one-per-period alerts), where plain
    dedup keeps only its first occurrence ever.

    Shuffle profile: ONE hash exchange on (keys, window-start) feeding a
    WindowGroupLimit rank-1 — at 100 TB the state per task is one row
    per (key, window) in flight, and the window column prunes to the
    scanned time range. Output: the surviving input rows plus
    ``window_start`` (timestamp).
    """
    if not keys:
        raise ValueError("windowed_dedup needs at least one key column")
    win = F.window(F.col(ts_col), window_duration)
    w = Window.partitionBy(
        *[F.col(k) for k in keys], F.col("__ws__")
    ).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    return (
        df.withColumn("__ws__", win["start"])
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
        .withColumnRenamed("__ws__", "window_start")
    )


def prune_hot_shingles(
    sh: DataFrame, max_df: int, strategy: str = "window"
) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``max_df`` (stop-shingle
    removal). Two strategies with opposite scale profiles:

    ``window`` (default): a whole-partition window count over ``shingle``
    then filter — one exchange, and the input relation is read exactly
    once. The agg form reads the input twice (df-count agg + anti-join),
    which forces callers to materialize the shingle relation first or
    re-run its explode+distinct pipeline per read; measured at sf0.1 the
    windowed form builds the pruned relation 3-4× faster steady-state.
    SKEW CAVEAT: the window shuffles every occurrence of a shingle to one
    task, and the hottest stop-shingles — the exact keys this function
    exists to remove — can approach the document count. At that point the
    hot key's partition becomes a straggler/spill task, so the windowed
    form is right when the relation is modest or hot keys are bounded
    (e.g. post-``distinct()`` shingles at bench scale).

    ``agg``: two-pass groupBy-count + broadcast anti-join. The groupBy has
    MAP-SIDE partial aggregation, so a shingle appearing in a billion docs
    arrives at the reduce side as one pre-combined row per map task —
    no single task ever holds the hot key's occurrences. The hot-shingle
    list (by construction small: only keys with df > max_df) broadcasts
    to an anti-join. This is the 100 TB path whenever max_df pruning
    targets genuinely hot keys; it costs a second read of ``sh``, so
    cache the relation first."""
    if strategy == "agg":
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df__"))
            .filter(F.col("__df__") > max_df)
            .select("shingle")
        )
        # the string-key join puts `shingle` first — restore input order
        return sh.join(F.broadcast(hot), "shingle", "left_anti").select(sh.columns)
    if strategy != "window":
        raise ValueError(f"unknown prune strategy {strategy!r}: window|agg")
    w = Window.partitionBy("shingle")
    return (
        sh.withColumn("__df__", F.count(F.lit(1)).over(w))
        .filter(F.col("__df__") <= max_df)
        .drop("__df__")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """All near-duplicate pairs by word-n-gram Jaccard similarity ≥ threshold.

    Inverted-index join: explode distinct shingles, self-join on shingle to
    count intersections, then |A∩B| / (|A|+|B|-|A∩B|). The shingle join is an
    equi-join Catalyst can shuffle-hash; a length filter prunes pairs whose
    size ratio already caps Jaccard below the threshold (standard prefix
    filter — drops the quadratic tail at scale).

    ``max_df`` is the scale guard: shingles appearing in more than ``max_df``
    documents are dropped from the index BEFORE the self-join (standard
    stop-shingle removal). Without it, one boilerplate shingle shared by d
    documents contributes d² join rows — quadratic in exactly the place a
    100× corpus hurts most. With it, per-key fan-out is bounded by
    max_df², and Jaccard is computed over the pruned shingle universe
    (sizes included) so the semantics stay exact and oracle-checkable.

    ``shingles_df`` lets callers share one cached ``shingles()`` relation
    across several dedup queries in a session.

    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    # The shingle relation feeds three plan branches (two join sides +
    # sizes): cache + materialize it once, or each branch re-runs the
    # explode/distinct pipeline. Self-built relations are HASHED (see
    # shingles(hashed=True)) — jaccard only needs key equality, so the
    # string path would shuffle corpus text for nothing.
    #
    # Prune strategy (r12): the BASE relation is cached and the prune is
    # the ``agg`` form — map-side-combined df counts + a broadcast
    # anti-join over the cache. The window form shuffles every occurrence
    # of a shingle to ONE task, and the hottest stop-shingles (the exact
    # keys max_df removes) are unbounded — at 32-way local concurrency
    # that shuffle, racing the caller's own cache population, was the
    # r11 curation_pipeline blowup, and at 100 TB it is a straggler/spill
    # task by construction. The agg form never concentrates a hot key:
    # both of its input reads hit the cache, the hot list is tiny by
    # definition (df > max_df), and each downstream branch re-applies a
    # cheap broadcast probe instead of re-reading a second cached copy.
    if shingles_df is not None:
        sh = shingles_df
        if max_df is not None:
            # caller-shared relations are cached by contract — the agg
            # prune's two reads both hit that cache, no second cache
            sh = prune_hot_shingles(sh, max_df, strategy="agg")
    elif max_df is not None:
        base = _cache(shingles(df, id_col, text_col, n, hashed=True))
        base.count()
        sh = prune_hot_shingles(base, max_df, strategy="agg")
    else:
        sh = _cache(shingles(df, id_col, text_col, n, hashed=True))
        sh.count()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    # Join on a 64-bit hash of the shingle, not the string: the self-join
    # shuffles every (id, key) row twice, and shingle strings are ~20-40
    # bytes vs 8 for the hash — at 100 TB that is the difference between
    # shuffling the corpus text and shuffling fixed-width keys. A 64-bit
    # collision would merge two distinct shingles into one intersection
    # count; at 10^9 distinct shingles the chance of even ONE collision is
    # ~3% and its effect is one off-by-one n_common for one pair —
    # accepted and documented (the string path never shuffles at all).
    a = sh.select(F.col(id_col).alias("id_a"), F.xxhash64("shingle").alias("__sh__"))
    b = sh.select(F.col(id_col).alias("id_b"), F.xxhash64("shingle").alias("__sh__"))
    common = (
        a.join(b, "__sh__")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    pairs = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        # size-ratio prune: jaccard <= min/max sizes
        .filter(F.least("n_a", "n_b") >= F.lit(threshold) * F.greatest("n_a", "n_b"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return pairs


def ngram_jaccard_against(
    new_df: DataFrame,
    ref_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    new_shingles: DataFrame | None = None,
    ref_shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs BETWEEN a new ingest batch and an existing reference
    corpus — the incremental regime: at 100 TB you never re-pair the
    historical corpus against itself, you compare the day's increment
    against the standing shingle index (which this function's
    ``ref_shingles`` argument lets you persist and reuse across batches).

    Same inverted-index equi-join + size-ratio prune as
    ``ngram_jaccard_pairs``, but the two join sides are different
    relations, so candidate traffic is |new|·fanout, not |corpus|².
    ``max_df`` prunes hot shingles by their document frequency in the
    REFERENCE index, and the same hot-shingle set is removed from the new
    side, keeping both sizes over one shingle universe (exact,
    oracle-checkable Jaccard). Id spaces must be disjoint.

    Output: (id_new, id_ref, jaccard).
    """
    if new_shingles is not None:
        new_sh = new_shingles
    else:
        new_sh = _cache(shingles(new_df, id_col, text_col, n, hashed=True))
        new_sh.count()
    if ref_shingles is not None:
        ref_sh = ref_shingles
    else:
        ref_sh = _cache(shingles(ref_df, id_col, text_col, n, hashed=True))
        ref_sh.count()
    if max_df is not None:
        hot = (
            ref_sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df__"))
            .filter(F.col("__df__") > max_df)
            .select("shingle")
        )
        ref_sh = _cache(ref_sh.join(F.broadcast(hot), "shingle", "left_anti").select(
            ref_sh.columns
        ))
        new_sh = _cache(new_sh.join(F.broadcast(hot), "shingle", "left_anti").select(
            new_sh.columns
        ))
        ref_sh.count(), new_sh.count()
    sizes_new = new_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_new"))
    sizes_ref = ref_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_ref"))
    a = new_sh.select(F.col(id_col).alias("id_new"), F.xxhash64("shingle").alias("__sh__"))
    b = ref_sh.select(F.col(id_col).alias("id_ref"), F.xxhash64("shingle").alias("__sh__"))
    common = (
        a.join(b, "__sh__")
        .groupBy("id_new", "id_ref")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes_new.withColumnRenamed(id_col, "id_new"), "id_new")
        .join(sizes_ref.withColumnRenamed(id_col, "id_ref"), "id_ref")
        .filter(
            F.least("n_new", "n_ref") >= F.lit(threshold) * F.greatest("n_new", "n_ref")
        )
        .select(
            "id_new",
            "id_ref",
            (
                F.col("n_common").cast("double")
                / (F.col("n_new") + F.col("n_ref") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    seen_digests: DataFrame | None = None,
    ref_shingles: DataFrame | None = None,
) -> DataFrame:
    """Admit only the batch rows that duplicate NOTHING in the standing
    corpus: exact content-digest matches and n-gram-Jaccard ≥ threshold
    near-dups are both dropped. The daily-ingest composition of
    ``exact_dedup``'s digest anti-join and ``ngram_jaccard_against``.
    (Batch-internal duplicates are deliberately out of scope — run
    ``exact_dedup``/``near_dedup_survivors`` on the batch first.)

    ``seen_digests`` (a (__digest__) relation) and ``ref_shingles`` (a
    ``shingles(hashed=...)`` relation) are the PERSISTED-INDEX inputs: the
    standing corpus's digest set and shingle index should be computed once,
    stored, and passed here per batch — without them every daily call
    re-shingles and re-digests the whole corpus, which defeats the
    incremental regime. Build them with ``content_digest`` / ``shingles``
    and append the admitted batch's rows after each ingest — but
    MATERIALIZE the returned DataFrame (checkpoint/collect/write) BEFORE
    appending: the plan reads the index lazily, so appending first makes
    every admitted row anti-join against its own freshly-written digest on
    re-evaluation (see the lifecycle test).

    With BOTH index inputs supplied, ``corpus`` is never read — pass
    ``None`` to make that contract explicit (the pure index-driven daily
    regime; the ``dedup_index_lifecycle`` catalog query runs it
    end-to-end).
    """
    if corpus is None and (seen_digests is None or ref_shingles is None):
        raise ValueError(
            "incremental_dedup: corpus=None requires BOTH seen_digests and "
            "ref_shingles (the persisted-index inputs)"
        )
    seen = (
        seen_digests
        if seen_digests is not None
        else corpus.select(content_digest(text_col).alias("__digest__")).distinct()
    )
    fresh = (
        batch.withColumn("__digest__", content_digest(text_col))
        .join(seen, "__digest__", "left_anti")
        .drop("__digest__")
    )
    near = ngram_jaccard_against(
        fresh, corpus, id_col, text_col, n, threshold,
        max_df=max_df, ref_shingles=ref_shingles,
    ).select(F.col("id_new").alias(id_col)).distinct()
    return fresh.join(near, id_col, "left_anti")


MINHASH_PRIME = (1 << 31) - 1


def minhash_coefficients(num_hashes: int, seed: int = 42):
    """The (a_i, b_i) universal-hash coefficients, exposed so an external
    oracle (e.g. DuckDB SQL) can replicate signatures bit-for-bit.
    Memoized: per-ROW consumers (the streaming filter's signature path)
    must not re-derive the RNG stream per call."""
    return _minhash_coefficients_cached(num_hashes, seed)


from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=32)
def _minhash_coefficients_cached(num_hashes: int, seed: int):
    import numpy as np

    rng = np.random.RandomState(seed)
    p = np.int64(MINHASH_PRIME)
    a = rng.randint(1, p, size=num_hashes).astype(np.int64)
    b = rng.randint(0, p, size=num_hashes).astype(np.int64)
    # read-only: cached arrays are shared across callers
    a.setflags(write=False)
    b.setflags(write=False)
    return a, b


def py_minhash_signature(
    text: str | None, n: int = 3, num_hashes: int = 64, seed: int = 42
):
    """Pure-Python twin of ``minhash_signatures(hash_family='portable')``
    for broadcast-probe consumers (the streaming ingest filter) that
    compute signatures OUTSIDE a Spark plan: same normalization
    (``operators.norm``), same word-n-gram shingles, same md5-derived
    31-bit base hash, same (a·x+b) mod p permutation mins — pinned
    signature-for-signature against the Spark operator by test. Returns a
    ``np.int64`` array of length ``num_hashes``, or ``None`` when the
    text yields no shingles (such docs carry no signature in the Spark
    path either).

    Parity boundary: lowercasing here is Python ``str.lower()`` while the
    Spark operator uses SQL ``lower()`` (JVM ``UTF8String``). The two
    agree on ASCII and on the common one-to-one BMP case mappings, but a
    handful of special-cased codepoints expand differently (e.g. Python
    maps ``İ`` U+0130 to ``i`` + combining dot above). Signatures are
    bit-identical for ASCII/simple-BMP text — the domain the parity test
    pins; treat exotic-case-mapping locales as outside the contract, or
    pre-fold case upstream with one rule on both sides.
    """
    import hashlib
    import re

    import numpy as np

    # Java \s is ASCII-only ([ \t\n\x0b\f\r]); Spark's trim strips spaces
    norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", (text or "").lower()).strip(" ")
    tokens = [t for t in norm.split(" ") if t]
    if len(tokens) >= n:
        grams = {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}
    else:
        grams = {" ".join(tokens)} if tokens else set()
    grams.discard("")
    if not grams:
        return None
    a, b = minhash_coefficients(num_hashes, seed)
    h = np.array(
        [
            int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) & 0x7FFFFFFF
            for g in grams
        ],
        dtype=np.int64,
    )
    perm = (h[:, None] * a[None, :] + b[None, :]) % np.int64(MINHASH_PRIME)
    return perm.min(axis=0)


def py_minhash_signatures_batch(
    texts, n: int = 3, num_hashes: int = 64, seed: int = 42
):
    """Batch twin of ``py_minhash_signature``: one call per Arrow batch
    instead of one per row. Bit-identical signatures (same normalization,
    md5 base hash, and permutation family — pinned by test); the win is
    amortization: distinct shingles across the batch are hashed ONCE and
    the (a·x+b) mod p permutation mins run as chunked numpy passes over
    an (S_distinct × num_hashes) matrix rather than len(texts) small
    ones. Measured at 4k docs × ~80 tokens: ~3× faster than the per-row
    twin when shingles repeat across the batch (the near-dup-stream
    regime this serves); ~1.3× slower on fully-random text where the
    dedup dict finds nothing (the md5 calls then dominate both paths).

    Returns a list aligned with ``texts``: ``np.int64[num_hashes]`` per
    text, or ``None`` where the text yields no shingles.
    """
    import hashlib
    import re

    import numpy as np

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    shingle_ix: dict = {}  # shingle -> row in the batch hash vector
    doc_grams: list = []  # per text: list of shingle row indexes, or None
    for text in texts:
        norm = ws.sub(" ", (text or "").lower()).strip(" ")
        tokens = [t for t in norm.split(" ") if t]
        if len(tokens) >= n:
            grams = {
                " ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
            }
        else:
            grams = {" ".join(tokens)} if tokens else set()
        grams.discard("")
        if not grams:
            doc_grams.append(None)
            continue
        doc_grams.append(
            [shingle_ix.setdefault(g, len(shingle_ix)) for g in grams]
        )
    if not shingle_ix:
        return [None] * len(doc_grams)
    # dict preserves insertion order and setdefault assigned 0..S-1 in
    # that order, so iterating keys IS index order. int.from_bytes of the
    # first 4 digest bytes == int(hexdigest[:8], 16) — same value, no hex
    # round-trip.
    md5 = hashlib.md5
    h = np.array(
        [
            int.from_bytes(md5(g.encode("utf-8")).digest()[:4], "big")
            & 0x7FFFFFFF
            for g in shingle_ix
        ],
        dtype=np.int64,
    )
    a, b = minhash_coefficients(num_hashes, seed)
    # (a·x+b) mod (2^31-1) via Mersenne shift-and-fold in cache-sized
    # chunks: int64 `%` on the full (S × K) matrix is ~8× slower (scalar
    # division microcode + 3 full-matrix temporaries). Bit-identical to
    # `% MINHASH_PRIME` — pinned against py_minhash_signature by test.
    p = np.int64(MINHASH_PRIME)
    perm = np.empty((len(h), num_hashes), dtype=np.int64)
    chunk = 16384
    for i in range(0, len(h), chunk):
        z = h[i : i + chunk, None] * a[None, :]
        z += b[None, :]
        z = (z & p) + (z >> 31)  # z < 2^62 → < 2^32
        z = (z & p) + (z >> 31)  # → <= p + 1
        np.subtract(z, p, out=z, where=(z >= p))
        perm[i : i + chunk] = z
    return [
        None if ix is None else perm[ix].min(axis=0) for ix in doc_grams
    ]


def base_hash_31(col) -> Column:
    """31-bit base hash from the md5 hex prefix — chosen over xxhash64
    because every engine has md5, so DuckDB oracles can replicate it:
    ``('0x' || substr(md5(s),1,8))::BIGINT & 2147483647``."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(0x7FFFFFFF))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    shingles_df: DataFrame | None = None,
    hash_family: str = "portable",
) -> DataFrame:
    """MinHash signature per document: array<long> of length ``num_hashes``.

    Hash family: universal hashing h_i(s) = (a_i·x + b_i) mod p over the
    31-bit base hash x = base_hash_31(shingle), p = 2^31-1. One JVM
    hash per shingle; all ``num_hashes`` permutations are ONE numpy
    broadcasted matrix op per Arrow batch. The base-hash rows shuffle once
    on the doc id (compact: two longs per shingle) so each doc's signature
    is computed whole — no wide aggregate (whose codegen compiles
    pathologically slowly), no 64× row blow-up.

    ``hash_family``: ``'portable'`` (default) derives the 31-bit base hash
    from md5, so the whole pipeline is replicable in DuckDB SQL — the
    oracle story. ``'fast'`` uses xxhash64 (codegen'd JVM hash, no string
    hex/conv round-trip) — ~2× cheaper per shingle and statistically
    equivalent signatures, but NOT reproducible outside Spark; use it in
    production jobs that don't need cross-engine verification. Identical
    documents get identical signatures under either family.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    p = np.int64(MINHASH_PRIME)
    a, b = minhash_coefficients(num_hashes)

    if hash_family == "portable":
        base = base_hash_31("shingle")
    elif hash_family == "fast":
        base = F.xxhash64("shingle").bitwiseAND(F.lit(0x7FFFFFFF))
    else:
        raise ValueError(f"unknown hash_family {hash_family!r}")
    sh = shingles_df if shingles_df is not None else shingles(df, id_col, text_col, n)
    hashed = sh.select(F.col(id_col), base.alias("h"))
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("signature", T.ArrayType(T.LongType()), False),
        ]
    )

    def compute(batches):
        # repartition(id) co-locates each doc's rows in one partition; the
        # iterator may still split a doc across Arrow batches, so concat.
        pdfs = [pdf for pdf in batches if len(pdf)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        # one vectorized pass per PARTITION, not one small matmul per doc:
        # sort rows by doc, permute every shingle hash in cache-sized
        # chunks (Mersenne shift-and-fold — bit-identical to `% p`, ~8×
        # faster than int64 division), then per-doc mins via one
        # minimum.reduceat over the group boundaries. At 10× bench scale
        # the old per-doc Python loop dominated the whole LSH query.
        ids = pdf[id_col].to_numpy()
        h = pdf["h"].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids, h = ids[order], h[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        perm = np.empty((len(h), num_hashes), dtype=np.int64)
        chunk = 16384
        for i in range(0, len(h), chunk):
            # a*h+b fits int64 (31-bit × 31-bit)
            z = h[i : i + chunk, None] * a[None, :]
            z += b[None, :]
            z = (z & p) + (z >> 31)
            z = (z & p) + (z >> 31)
            np.subtract(z, p, out=z, where=(z >= p))
            perm[i : i + chunk] = z
        mins = np.minimum.reduceat(perm, starts, axis=0)
        yield pd.DataFrame({id_col: ids[starts], "signature": mins.tolist()})

    return hashed.repartition(n_parts, F.col(id_col)).mapInPandas(compute, schema=out_schema)


def minhash_params_for_threshold(
    threshold: float,
    num_hashes: int = 64,
) -> tuple[int, int]:
    """Pick (bands, rows_per_band) whose LSH S-curve is centered on the
    target Jaccard threshold.

    A pair with Jaccard s collides in ≥1 band with p(s) = 1-(1-s^r)^b; the
    curve's inflection sits near (1/b)^(1/r). Among the divisor pairs of
    ``num_hashes`` we take the one minimizing |(1/b)^(1/r) - threshold| —
    lower thresholds get more bands with fewer rows (recall), higher
    thresholds fewer, wider bands (precision). Deterministic, so oracle
    SQL can replicate the banding exactly.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    best = None
    for bands in range(1, num_hashes + 1):
        if num_hashes % bands:
            continue
        rows = num_hashes // bands
        inflection = (1.0 / bands) ** (1.0 / rows)
        score = abs(inflection - threshold)
        if best is None or score < best[0]:
            best = (score, bands, rows)
    return best[1], best[2]


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int | None = 16,
    threshold: float = 0.5,
    shingles_df: DataFrame | None = None,
    hash_family: str = "portable",
) -> DataFrame:
    """Near-dup candidate pairs via MinHash + LSH banding, verified by
    signature-estimated Jaccard ≥ threshold.

    shingle → minhash → band (rows = num_hashes/bands) → bucket equi-join on
    (band_idx, band_hash) → estimate jaccard as matching-signature-position
    fraction. Only bucket-colliding pairs are compared: the candidate set is
    linear-ish in practice, never O(n²).

    ``bands=None`` auto-derives the banding from the threshold via
    ``minhash_params_for_threshold`` (S-curve centering).

    Output: (id_a, id_b, est_jaccard).
    """
    if bands is None:
        bands, _ = minhash_params_for_threshold(threshold, num_hashes)
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    sig = _cache(minhash_signatures(
        df, id_col, text_col, n, num_hashes, shingles_df, hash_family
    ))
    # Materialize the signature cache eagerly: the banding join + estimate
    # then plan against the short InMemoryRelation instead of one giant DAG
    # (shingle explode → 64-agg → posexplode → self-join → zip_with), which
    # Catalyst/AQE re-plans pathologically slowly in long-lived sessions.
    sig.count()
    banded = sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.hash(*[F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)])
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    left = banded.select(F.col(id_col).alias("id_a"), "band_idx", "band_hash")
    right = banded.select(F.col(id_col).alias("id_b"), "band_idx", "band_hash")
    candidates = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    candidates = _cache(candidates)
    # Materialize: AQE's broadcast-stage materialization re-executes uncached
    # subtrees once per join stage otherwise.
    candidates.count()
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"))
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    ).cast("double") / F.lit(num_hashes)
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def minhash_lsh_against(
    new_df: DataFrame,
    ref_signatures: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int | None = 16,
    threshold: float = 0.5,
    new_signatures: DataFrame | None = None,
    hash_family: str = "portable",
) -> DataFrame:
    """MinHash+LSH near-dup pairs between a NEW batch and a PERSISTED
    signature index — the sketch-index counterpart of
    ``ngram_jaccard_against``: the standing corpus keeps only
    ``num_hashes`` longs per document (built once with
    ``minhash_signatures`` and stored), so incremental near-dedup never
    re-reads or re-shingles corpus text at all.

    ``ref_signatures`` must have (id, signature) with the SAME
    ``num_hashes``/``hash_family``/``n`` the index was built with — the
    banding recomputed here is deterministic in the signature alone, so
    mixed parameters produce garbage. Signature LENGTH is enforced at
    execution time: any index row with a different length raises (a
    silently-dropped mismatch would empty the pair set and admit every
    duplicate). Same-length/different-family mismatches are undetectable
    from the data — record the build parameters next to the index.
    Id spaces must be disjoint.

    Output: (id_new, id_ref, est_jaccard ≥ threshold).
    """
    if bands is None:
        bands, _ = minhash_params_for_threshold(threshold, num_hashes)
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    if new_signatures is not None:
        sig_new = new_signatures
    else:
        sig_new = _cache(minhash_signatures(
            new_df, id_col, text_col, n, num_hashes, None, hash_family
        ))
        sig_new.count()
    # Execution-time length validation: any index row whose signature length
    # differs from num_hashes raises — a silently-filtered mismatch would
    # DISABLE near-dedup (empty pair set → every duplicate admitted), the
    # worst possible failure mode for a mis-parameterized persisted index.
    sig_ref = ref_signatures.withColumn(
        "signature",
        F.when(F.size("signature") == num_hashes, F.col("signature")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "minhash_lsh_against: ref_signatures row has signature "
                        "length "
                    ),
                    F.size("signature").cast("string"),
                    F.lit(f", expected num_hashes={num_hashes}; the persisted "
                          "index was built with different parameters"),
                )
            )
        ),
    )

    def banded(sig: DataFrame, out_id: str) -> DataFrame:
        return sig.select(
            F.col(id_col).alias(out_id),
            F.posexplode(
                F.array(
                    *[
                        F.hash(
                            *[
                                F.col("signature")[b * rows_per_band + r]
                                for r in range(rows_per_band)
                            ]
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band_idx", "band_hash"),
        )

    candidates = (
        banded(sig_new, "id_new")
        .join(banded(sig_ref, "id_ref"), ["band_idx", "band_hash"])
        .select("id_new", "id_ref")
        .distinct()
    )
    sa = sig_new.select(F.col(id_col).alias("id_new"), F.col("signature").alias("sig_a"))
    sb = sig_ref.select(F.col(id_col).alias("id_ref"), F.col("signature").alias("sig_b"))
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    ).cast("double") / F.lit(num_hashes)
    return (
        candidates.join(sa, "id_new")
        .join(sb, "id_ref")
        .select("id_new", "id_ref", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per document over word features.

    Per token t: h = md5-derived 64-bit hash (hi 32 bits = first 8 md5 hex
    chars, lo 32 bits = next 8 — replicable in DuckDB via
    ``('0x'||substr(md5(t),...))::BIGINT`` per half); bit b contributes +1 if
    set else -1; the fingerprint sets bit b where the sum > 0. Expressed as
    explode + one groupBy with per-bit sums (native aggregates, map-side
    combine).
    """
    if bits != 64:
        raise ValueError("only 64-bit simhash supported")
    # parallelize the explode for compact sources only — at scale the scan
    # already has the partitions and this would shuffle corpus text
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n_parts:
        df = df.repartition(n_parts, F.col(id_col))
    hhi = F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
    hlo = F.conv(F.substring(F.md5("token"), 9, 8), 16, 10).cast("long")
    tokens = (
        df.select(
            F.col(id_col),
            F.explode(
                F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
            ).alias("token"),
        )
        .withColumn("h", F.shiftleft(hhi, 32).bitwiseOR(hlo))
    )
    # LONG format (one row per token-bit) for the same reason as
    # minhash_signatures: a 64-wide aggregate generates one enormous codegen
    # method. Bits are disjoint, so summing shiftleft(1, b) terms equals the
    # bitwise OR — including bit 63, whose term wraps to Long.MIN_VALUE
    # (two's complement) exactly as intended.
    bit_sums = (
        tokens.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
            F.col("h"),
        )
        .select(
            id_col,
            "b",
            # shiftrightunsigned with a column shift amount needs SQL form
            F.expr(
                "CASE WHEN (shiftrightunsigned(h, b) & 1) != 0 THEN 1 ELSE -1 END"
            ).alias("c"),
        )
        .groupBy(id_col, "b")
        .agg(F.sum("c").alias("s"))
    )
    return (
        bit_sums.groupBy(id_col)
        .agg(
            F.sum(
                F.when(
                    F.col("s") > 0,
                    F.expr("shiftleft(CAST(1 AS BIGINT), b)"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
        .select(F.col(id_col), F.col("simhash").cast("long").alias("simhash"))
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole blocking: split the 64-bit fingerprint into ``blocks`` chunks;
    any pair within distance ``max_hamming < blocks`` agrees on ≥1 chunk, so
    candidates come from equi-joins on (block_idx, chunk) — no O(n²) scan.
    """
    if max_hamming >= blocks:
        raise ValueError("need max_hamming < blocks for pigeonhole guarantee")
    fp = _cache(simhash(df, id_col, text_col))
    fp.count()  # materialize before the self-join (see minhash_lsh_pairs)
    width = 64 // blocks
    chunks = fp.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("block_idx", "chunk"),
    )
    left = chunks.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("fp_a"), "block_idx", "chunk"
    )
    right = chunks.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("fp_b"), "block_idx", "chunk"
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        left.join(right, ["block_idx", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def near_dedup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    method: str = "jaccard",
    max_df: int | None = None,
    shingles_df: DataFrame | None = None,
    cc_algorithm: str = "auto",
) -> DataFrame:
    """Cluster-aware near-dedup: pair detection → connected components →
    keep one representative (min id) per duplicate CLUSTER.

    Greedy pair-dropping misses transitive duplicates (a≈b, b≈c, a̸≈c keeps
    a and c); connected components merge the chain. ``cc_algorithm``
    selects ``auto`` (default: probe label propagation, fall back to the
    O(log² n) star algorithm on non-convergence — no diameter guess
    needed), ``label``, or ``star`` — see
    ``operators.graph.connected_components``. Output: the surviving rows
    of ``df``.
    """
    from pangool_spark.operators.graph import connected_components

    if method == "jaccard":
        pairs = ngram_jaccard_pairs(
            df, id_col, text_col, n, threshold, max_df=max_df, shingles_df=shingles_df
        )
    elif method == "minhash":
        pairs = minhash_lsh_pairs(
            df, id_col, text_col, n, threshold=threshold, shingles_df=shingles_df
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    comps = connected_components(pairs, "id_a", "id_b", algorithm=cc_algorithm)
    # drop every clustered vertex that is not its component's min
    losers = comps.filter(F.col("vertex") != F.col("component")).select(
        F.col("vertex").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): assign
    every embedding to its nearest centroid, then drop near-duplicates
    (cosine ≥ ``threshold``) WITHIN each cluster, keeping the minimum id.

    Scale shape: clustering turns the corpus-wide O(n²) pair space into
    per-cell O((n/k)²)·k — one equi-join on the cell id, never a cartesian.
    Production sizing: k grows with the corpus (SemDeDup uses ~10⁴-10⁵
    clusters for web scale) so cells stay task-sized; hot cells are split
    by AQE skew handling. Centroids are plan literals here — at real scale
    they come from a sampled k-means fit (see ``ivf_assign``).

    Deviation from the paper: SemDeDup keeps the item with the LOWEST
    cosine to the centroid per duplicate group; we keep the minimum id —
    deterministic, oracle-replicable, and equivalent for dedup purposes.
    Returns the surviving rows of ``df``. Ids must be integral (the
    grouped-map schema pins LONG, same contract as
    ``similarity.blocked_cosine_pairs``).

    Kernel: vectors shuffle ONCE on the cell id; each cell runs a
    row-chunked dense matmul (peak intermediate = a
    ``_MATMUL_CHUNK``×|cell| float64 panel, not |cell|²) and emits only
    loser ids — a within-cell pair never materializes as a join row.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from pangool_spark.operators.similarity import _MATMUL_CHUNK, ivf_assign

    assigned = ivf_assign(df, centroids, id_col, vec_col, out_col="__cell__")

    out_schema = T.StructType([T.StructField(id_col, T.LongType(), False)])

    def cell_losers(key, pdf):
        # ascending-id order so "exists a smaller near-dup" = upper triangle
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame({id_col: []}).astype({id_col: np.int64})
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-12)
        loser = np.zeros(len(ids), dtype=bool)
        for s in range(0, len(ids), _MATMUL_CHUNK):
            e = min(s + _MATMUL_CHUNK, len(ids))
            sims = (mat[s:e] @ mat.T) / np.outer(norms[s:e], norms)
            ii, jj = np.nonzero(sims >= threshold)
            keep = (ii + s) < jj
            loser[jj[keep]] = True
        return pd.DataFrame({id_col: ids[loser]})

    losers = (
        assigned.select("__cell__", id_col, vec_col)
        .groupBy("__cell__")
        .applyInPandas(cell_losers, schema=out_schema)
    )
    return df.join(losers, id_col, "left_anti")


def contamination_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 13,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document count of distinct word ``n``-grams shared with a
    benchmark/eval corpus → (id, n_overlap), only documents with ≥1 hit.

    Scale shape: the benchmark side collapses to a DISTINCT set of 8-byte
    shingle hashes — for real eval suites that is tiny next to a 100 TB
    training corpus, so it broadcasts and the membership probe runs
    MAP-SIDE against the corpus shingle stream (no corpus-wide shuffle).
    Only the matched (id, hash) rows reach the per-document count, whose
    partial aggregation makes even a benchmark-quoting-spam document
    arrive at the reduce side pre-combined. Set
    ``broadcast_benchmark=False`` to fall back to a shuffle equi-join when
    the benchmark set is itself huge.

    Hashing note: overlap is equality-only, so both sides use xxhash64
    shingles (corpus text never shuffles); a collision inflates one
    document's overlap count by one.
    """
    bench_sh = shingles(
        benchmark, id_col=benchmark.columns[0],
        text_col=bench_text_col or text_col, n=n, hashed=True,
    ).select("shingle").distinct()
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    doc_sh = shingles(docs, id_col=id_col, text_col=text_col, n=n, hashed=True)
    return (
        doc_sh.join(bench_sh, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 13,
    min_overlap: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: drop training documents sharing
    ``min_overlap``+ distinct word ``n``-grams with an eval corpus (the
    13-gram discipline popularized by the GPT-3 appendix; no reference
    counterpart — training-data extension layer). Returns the surviving
    rows of ``docs``; the drop is a broadcast-able anti-join on ids."""
    hits = contamination_overlap(
        docs, benchmark, id_col, text_col, bench_text_col, n,
        broadcast_benchmark,
    ).filter(F.col("n_overlap") >= min_overlap).select(id_col)
    return docs.join(hits, id_col, "left_anti")


def contamination_filter(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 13,
    min_overlap: int = 1,
    max_bench_shingles: int | None = 50_000_000,
) -> DataFrame:
    """STATELESS decontamination: the benchmark's distinct shingle hashes
    are collected driver-side (eval suites are small by contract — same
    bounded-broadcast policy as ``knn_bruteforce``'s query set) and probed
    per row inside an Arrow-batched UDF. Zero shuffles, no aggregation
    state — so unlike ``decontaminate`` (groupBy + anti-join) this form
    runs UNCHANGED on a streaming DataFrame as an ingest-time filter.

    Matches ``decontaminate`` row-for-row on batch input: per-row distinct
    n-gram xxhash64 set vs the same benchmark set, drop when the overlap
    reaches ``min_overlap``.

    ``max_bench_shingles`` ENFORCES the bounded-broadcast contract (8
    bytes/hash → the 5·10^7 default caps the raw set at ~0.4 GB before
    Python set overhead): a benchmark whose distinct shingles exceed it
    raises — with ``decontaminate`` (shuffled groupBy + anti-join, no
    driver collection) named as the scale path — instead of silently
    OOMing the driver mid-collect. ``None`` waives the guard.
    """
    from pangool_spark.operators._udfs import membership_overlap_udf

    bench_shingles = shingles(
        benchmark, id_col=benchmark.columns[0],
        text_col=bench_text_col or text_col, n=n, hashed=True,
    ).select("shingle").distinct()
    if max_bench_shingles is not None:
        probe = bench_shingles.limit(max_bench_shingles + 1).count()
        if probe > max_bench_shingles:
            raise ValueError(
                f"contamination_filter: benchmark has more than "
                f"{max_bench_shingles} distinct shingles — too large for "
                "the driver-side broadcast set. Use decontaminate() (the "
                "shuffled groupBy + anti-join form) for benchmarks at this "
                "scale, or raise max_bench_shingles if the driver is sized "
                "for it."
            )
    bench_set = frozenset(r[0] for r in bench_shingles.collect())
    overlap_count = membership_overlap_udf(bench_set)

    toks = normalized_tokens(text_col)
    # mirror shingles(): docs shorter than n contribute their whole token
    # string as one shingle
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    hashed = F.array_distinct(
        F.transform(
            F.filter(grams, lambda g: g != ""), lambda g: F.xxhash64(g)
        )
    )
    return docs.filter(overlap_count(hashed) < min_overlap)


def choose_embedding_dedup_method(threshold: float) -> str:
    """Strategy selection for ``embedding_cosine_dups(method="auto")``.

    Sign-LSH earns its keep only at high thresholds: its exponent is
    ρ = ln(p1)/ln(p2), and at t=0.4 ρ≈0.66 so the candidate volume
    approaches all-pairs — every LSH constant (multi-table banding, the
    bucket join, the verify pass) is then pure overhead on top of an
    effectively O(n²) candidate stream. Below the production near-dup
    regime we switch to the blocked exact matmul
    (``similarity.blocked_cosine_pairs``), which accepts O(n²) comparisons
    but does them as dense BLAS with O(n²/rows_per_block) shuffle rows.
    Cut-over at t=0.8 where ρ ≈ 0.33, tightening to ρ ≈ 0.22 by t=0.9
    (see ``auto_lsh_params``).
    """
    return "lsh" if threshold >= 0.8 else "blocked"


def embedding_cosine_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    method: str = "auto",
    target_miss: float = 1e-6,
    n_rows: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold.

    ``method="auto"`` (default) picks the strategy by threshold tier
    (``choose_embedding_dedup_method``): sign-LSH for t ≥ 0.8 where its
    collision model prunes aggressively, blocked exact matmul below that
    where LSH is degenerate. Both emit only exactly-verified pairs, so the
    output (and any SQL oracle) is identical across strategies.

    ``method="lsh"``: sign-LSH candidate generation with (planes, tables)
    auto-derived from the collision model (``similarity.auto_lsh_params``),
    then exact cosine verify — every emitted pair is exactly checked, so
    precision is 1.0 and recall is 1 - target_miss per qualifying pair. The
    plan is equi-joins only: no BroadcastNestedLoopJoin / cartesian at any
    scale.

    ``method="blocked"``: exact block-pair matmul — O(n²) comparisons as
    dense BLAS over B(B+1)/2 independent block-pair tasks, no join in the
    plan at all (recall 1.0 by construction).

    ``method="exact"``: brute-force theta join — O(n²) JOIN ROWS, the
    verify path for small fixtures and recall audits only.

    ``n_rows``: optional corpus-size hint forwarded to the LSH verify
    planner / block sizing, avoiding any driver-blocking ``count()`` on
    the LSH path.
    """
    from pangool_spark.operators._udfs import cosine_udf

    if method == "auto":
        method = choose_embedding_dedup_method(threshold)
    if method == "blocked":
        from pangool_spark.operators.similarity import blocked_cosine_pairs

        return blocked_cosine_pairs(
            emb, threshold=threshold, id_col=id_col, vec_col=vec_col, n_rows=n_rows
        )
    if method == "lsh":
        from pangool_spark.operators.similarity import auto_lsh_params, lsh_cosine_pairs

        dim_row = emb.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
        if not dim_row:
            return emb.sparkSession.createDataFrame(
                [], f"id_a LONG, id_b LONG, cosine DOUBLE"
            )
        n_planes, n_tables = auto_lsh_params(threshold, target_miss)
        return lsh_cosine_pairs(
            emb,
            dim=dim_row[0]["d"],
            threshold=threshold,
            n_planes=n_planes,
            n_tables=n_tables,
            id_col=id_col,
            vec_col=vec_col,
            n_rows=n_rows,
        )
    if method != "exact":
        raise ValueError(f"unknown method {method!r}")
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_udf("va", "vb").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 6,
    min_len: int | None = None,
    max_gram_df: int | None = None,
) -> DataFrame:
    """Maximal duplicated TOKEN SPANS across document pairs — substring-
    level dedup (the ExactSubstr regime of Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"), the layer between
    line_dedup (whole repeated lines) and minhash near-dedup (whole
    near-identical docs): it localizes WHERE two documents share verbatim
    text, so curation can cut the span instead of dropping a document.

    Spark-first design — no suffix array. Every k-token window ("anchor")
    is hashed; anchors equi-join on the hash; within a (doc_a, doc_b,
    diagonal = pos_a - pos_b) group, consecutive anchor runs merge into
    maximal spans via one window pass. A run of r consecutive anchors
    proves a shared span of exactly r + k - 1 tokens, and mid-span anchor
    gaps are impossible (a missing anchor inside a shared region
    contradicts the two anchors flanking it), so run-merge IS maximal-span
    recovery — same output as the suffix-array formulation for spans
    ≥ k tokens, but expressed as join + window, which Spark distributes.

    Scale shape: the anchor join shuffles (md5, id, pos) — corpus text
    never shuffles; both join sides read one exchange (self-join reuse).
    The run-merge window partitions by (doc_a, doc_b, diag) and the
    closing aggregate groups by a superset, so it rides the same exchange
    (EnsureRequirements: hash partitioning on a subset of the grouping
    keys satisfies the clustered distribution — one window shuffle total).
    Hot k-grams (boilerplate headers shared by millions of docs) fan the
    join quadratically: ``max_gram_df`` drops anchors whose gram appears
    in more than that many DISTINCT documents — lossy for spans whose
    every anchor is that common (cut-marked in the output contract), the
    standard ExactSubstr stop-gram concession.

    Output: (doc_a, doc_b, start_a, start_b, span_len) — 0-based token
    positions, ``doc_a < doc_b``, one row per maximal span, spans shorter
    than ``min_len`` tokens dropped when given.
    """
    from pyspark.ml.feature import NGram

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n_parts:
        df = df.repartition(n_parts, F.col(id_col))
    toks = df.select(
        F.col(id_col).alias("__id__"), normalized_tokens(text_col).alias("__tokens__")
    )
    grams = NGram(n=k, inputCol="__tokens__", outputCol="__grams__").transform(toks)
    # NGram emits [] for docs shorter than k tokens — they have no anchors.
    anchors = grams.select(
        "__id__", F.posexplode("__grams__").alias("__pos__", "__gram__")
    ).select("__id__", "__pos__", F.md5("__gram__").alias("__key__"))
    if max_gram_df is not None:
        hot = (
            anchors.select("__key__", "__id__")
            .distinct()
            .groupBy("__key__")
            .agg(F.count(F.lit(1)).alias("__df__"))
            .filter(F.col("__df__") > max_gram_df)
            .select("__key__")
        )
        anchors = anchors.join(hot, "__key__", "left_anti")
    a = anchors.select(
        F.col("__id__").alias("doc_a"), F.col("__pos__").alias("__pa__"), "__key__"
    )
    b = anchors.select(
        F.col("__id__").alias("doc_b"), F.col("__pos__").alias("__pb__"), "__key__"
    )
    pairs = (
        a.join(b, "__key__")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "__pa__",
            "__pb__",
            (F.col("__pa__") - F.col("__pb__")).alias("__diag__"),
        )
    )
    w = Window.partitionBy("doc_a", "doc_b", "__diag__").orderBy("__pa__")
    runs = pairs.withColumn(
        "__brk__",
        F.when(F.col("__pa__") - F.lag("__pa__").over(w) == 1, F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn("__run__", F.sum("__brk__").over(w))
    out = (
        runs.groupBy("doc_a", "doc_b", "__diag__", "__run__")
        .agg(
            F.min("__pa__").alias("start_a"),
            F.min("__pb__").alias("start_b"),
            (F.count(F.lit(1)) + F.lit(k - 1)).alias("span_len"),
        )
        .select("doc_a", "doc_b", "start_a", "start_b", "span_len")
    )
    if min_len is not None:
        out = out.filter(F.col("span_len") >= min_len)
    return out


def novelty_score(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str | None = None,
    n: int = 13,
    broadcast_reference: bool = True,
) -> DataFrame:
    """GRADED contamination: per document, how much of it is new —
    novelty = 1 − |shingles ∩ reference| / |shingles| over distinct word
    ``n``-grams. The continuous cousin of ``decontaminate``'s hard drop:
    curation pipelines threshold or WEIGHT by novelty (dedup-aware
    sampling, freshness scoring of a re-crawl against the previous
    snapshot) instead of deciding at ingest.

    Same scale shape as ``contamination_overlap``: the reference
    collapses to a distinct 8-byte xxhash64 shingle set (broadcast by
    default; ``broadcast_reference=False`` for a shuffle join when the
    reference is itself a corpus), the membership probe is a map-side
    LEFT join on the corpus shingle stream, and ONE partial-combined
    aggregate produces both counts. Novelty is a single exact-rounded
    divide + subtract. Documents whose normalized text yields no
    shingles are absent (nothing to score).

    Output: (id, n_shingles, n_seen, novelty).
    """
    ref_sh = shingles(
        reference, id_col=reference.columns[0],
        text_col=ref_text_col or text_col, n=n, hashed=True,
    ).select("shingle").distinct().withColumn("__hit__", F.lit(1))
    if broadcast_reference:
        ref_sh = F.broadcast(ref_sh)
    doc_sh = shingles(docs, id_col=id_col, text_col=text_col, n=n, hashed=True)
    return (
        doc_sh.join(ref_sh, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit__").alias("n_seen"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_seen",
            (
                F.lit(1.0)
                - F.col("n_seen").cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("novelty"),
        )
    )


def hamming_neardup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_dist: int = 6,
    n_bands: int = 8,
    bits: int = 64,
) -> DataFrame:
    """Near-duplicate pairs over a fixed-width perceptual hash (dHash /
    SimHash-style): exact-duplicate COLLAPSE, then band-bucket candidate
    generation over DISTINCT hash values, then exact Hamming verify, then
    id-pair expansion — the image-dedup companion to ``lsh_band_pairs``.

    Pigeonhole guarantee: a pair at Hamming distance ≤ ``max_dist`` differs
    in at most ``max_dist`` of the ``n_bands`` equal-width bit bands, so
    with ``n_bands >= max_dist + 1`` at least one band is IDENTICAL and the
    band equi-join finds every qualifying pair (100% recall — banding for
    Hamming space is exact, unlike MinHash's probabilistic bands).

    Scale shape (the round-9 100× finding): an r-bit band has only 2^r
    values, so banding PER IMAGE caps bucket diversity at 2^r and the
    self-join goes quadratic the moment images outnumber distinct hashes
    (measured: 1M text-image hashes collapsed to a few hundred distinct
    values → 1.7e11 candidate pairs, job unfinishable). Collapsing to
    DISTINCT hashes first bounds the band join by HASH DIVERSITY — the
    real signal — independent of corpus size; recompressed copies never
    enter the join at all. The id-pair expansion afterwards is exactly
    the TRUE ANSWER size (every member-cross of near-identical hash
    groups) — when groups are huge that output is itself quadratic, which
    is a property of the data, not the plan; cluster-level consumers
    should join ``dist ≤ t`` hash pairs + the (hash → ids) relation
    themselves instead of materializing id pairs.

    Output: (id_a, id_b, dist) with id_a < id_b, dist ≤ max_dist —
    including dist-0 pairs (identical hashes).
    """
    if bits % n_bands != 0 or (bits // n_bands) % 4 != 0:
        raise ValueError(
            f"bits ({bits}) must split into n_bands ({n_bands}) hex-aligned"
            " bands (band width divisible by 4)"
        )
    if n_bands < max_dist + 1:
        raise ValueError(
            f"n_bands ({n_bands}) must be >= max_dist + 1 ({max_dist + 1}) "
            "for the pigeonhole recall guarantee; raise n_bands or lower "
            "max_dist"
        )
    if bits > 64:
        raise ValueError(
            f"bits ({bits}) > 64 unsupported: the hash is carried as one"
            " 64-bit integer end-to-end"
        )
    band_bits = bits // n_bands

    # The (id, hash) proxy is consumed FIVE times downstream (distinct
    # groups, both sides of the id-pair expansion, both sides of the
    # dist-0 self-join); without materialization Spark re-inlines the
    # whole upstream subtree — e.g. image_neardup_docs re-ran its
    # MapInPandas dHash decode 6x and scanned the corpus 12x. One eager
    # localCheckpoint of the 8-bytes/row proxy collapses that to a single
    # upstream pass. The hex hash is packed into ONE signed bigint
    # (conv base 16 -> -10 = two's-complement) so band keys are bit
    # slices, the Hamming verify is one bit_count(xor), and the band
    # join shuffles 8-byte ints instead of 16-char strings.
    ids = df.select(
        F.col(id_col).alias("__id__"),
        F.conv(F.lower(F.col(hash_col)), 16, -10)
        .cast("bigint")
        .alias("__h__"),
    ).localCheckpoint(eager=True)
    groups = ids.select("__h__").distinct()

    mask = (1 << band_bits) - 1
    bands = groups.select(
        "__h__",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(
                        F.col("__h__"), bits - (i + 1) * band_bits
                    ).bitwiseAND(F.lit(mask))
                    for i in range(n_bands)
                ]
            )
        ).alias("__band__", "__val__"),
    )

    a, b = bands.alias("a"), bands.alias("b")
    dist = F.bit_count(
        F.col("__ha__").bitwiseXOR(F.col("__hb__"))
    ).cast("int")
    # Verify BEFORE deduplicating: bit_count(xor) on the raw band-join
    # stream is a few cheap vectorized ops per candidate, so filtering to
    # dist <= max_dist first shrinks the distinct() shuffle from the full
    # candidate volume (sum of bucket^2 — 9.8M rows at sf0.1) to just the
    # qualifying near-pairs (hundreds). Previously the whole candidate
    # set was shuffled through distinct() carrying two 16-char hashes.
    hash_pairs = (
        a.join(
            b,
            (F.col("a.__band__") == F.col("b.__band__"))
            & (F.col("a.__val__") == F.col("b.__val__"))
            & (F.col("a.__h__") < F.col("b.__h__")),
        )
        .select(
            F.col("a.__h__").alias("__ha__"), F.col("b.__h__").alias("__hb__")
        )
        .withColumn("dist", dist)
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )

    # id-pair expansion: cross of the two hash groups for dist >= 1 ...
    ia = ids.select(F.col("__h__").alias("__ha__"), F.col("__id__").alias("__ida__"))
    ib = ids.select(F.col("__h__").alias("__hb__"), F.col("__id__").alias("__idb__"))
    cross = (
        hash_pairs.join(ia, "__ha__")
        .join(ib, "__hb__")
        .select(
            F.least("__ida__", "__idb__").alias("id_a"),
            F.greatest("__ida__", "__idb__").alias("id_b"),
            "dist",
        )
    )
    # ... plus within-group pairs for identical hashes (dist 0)
    same = (
        ids.alias("x")
        .join(
            ids.alias("y"),
            (F.col("x.__h__") == F.col("y.__h__"))
            & (F.col("x.__id__") < F.col("y.__id__")),
        )
        .select(
            F.col("x.__id__").alias("id_a"),
            F.col("y.__id__").alias("id_b"),
            F.lit(0).cast("int").alias("dist"),
        )
    )
    return cross.unionByName(same)


def lsh_recall_eval(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    truth_shingles_df: DataFrame | None = None,
    cand_shingles_df: DataFrame | None = None,
    truth_max_df: int | None = None,
) -> DataFrame:
    """Quality report for the MinHash+LSH dedup pipeline — 'measure,
    don't guess' applied to the pipeline itself: run BOTH the sketch
    path (``minhash_lsh_pairs``) and the exact n-gram-Jaccard truth
    (``ngram_jaccard_pairs``) at the same threshold and report

        precision = |reported ∩ truth| / |reported|
        recall    = |reported ∩ truth| / |truth|

    — the ANN-recall discipline (``ann_recall``'s text-dedup twin). The
    truth side is the exact inverted-index join (run it at eval SF, not
    at 100 TB: evaluating on a sampled slice is the production calibration
    loop); the reported side is the production sketch path. One pair
    equi-join + one aggregate on top of the two existing pipelines.

    Output: one row (n_true, n_reported, n_hit, precision, recall) —
    precision/recall NULL when their denominator is 0.
    """
    truth = ngram_jaccard_pairs(
        df, id_col, text_col, n, threshold,
        max_df=truth_max_df, shingles_df=truth_shingles_df,
    ).select("id_a", "id_b", F.lit(1).alias("__t__"))
    # separate shingle relations by design: the truth side wants the
    # pruned HASHED universe (jaccard needs only key equality), while the
    # sketch side hashes the shingle STRING (md5 base hash)
    reported = minhash_lsh_pairs(
        df, id_col, text_col, n, num_hashes, bands, threshold,
        shingles_df=cand_shingles_df,
    ).select("id_a", "id_b", F.lit(1).alias("__r__"))
    joined = truth.join(reported, ["id_a", "id_b"], "full_outer")
    agg = joined.agg(
        F.count("__t__").alias("n_true"),
        F.count("__r__").alias("n_reported"),
        F.count(F.when(F.col("__t__").isNotNull() & F.col("__r__").isNotNull(), 1)).alias("n_hit"),
    )
    return agg.select(
        "n_true",
        "n_reported",
        "n_hit",
        F.when(
            F.col("n_reported") > 0,
            F.col("n_hit").cast("double") / F.col("n_reported").cast("double"),
        ).alias("precision"),
        F.when(
            F.col("n_true") > 0,
            F.col("n_hit").cast("double") / F.col("n_true").cast("double"),
        ).alias("recall"),
    )
