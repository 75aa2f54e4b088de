"""Distributed model fit/apply — the reference's NaiveBayes example pair
re-expressed Spark-first.

Ref ``EX/naivebayes/NaiveBayesGenerate.java:34-116`` (train: per
(word, category) counts via group-by with a combiner) and
``EX/naivebayes/NaiveBayesClassifier.java:40-120`` (classify: model loaded
into memory in ``init()``, then a map-only job scores each line). The
Spark restatement keeps the same two-phase shape: training is ONE
partial-aggregated groupBy (Catalyst's HashAggregate replaces the
explicit ``setTupleCombiner``); classification broadcasts the model
relation and scores with pure JVM expressions — a map-side join exactly
like the reference's in-memory ``init()``, but without collecting
anything to the driver by hand.

Deviation (documented): the reference tracks the best (category, score)
WHILE accumulating token scores (``NaiveBayesClassifier.java:84-95``), so
with always-negative log terms its running max effectively freezes the
decision after the first token. We take the textbook argmax of the FINAL
per-category sum; ties break toward the lexicographically smallest
category, and token-less documents classify as NULL (the reference
returns null there too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Java \p{Punct} is the ASCII punctuation block — spelled out so DuckDB
# oracles can use the identical class.
_PUNCT_CLASS = r"[!-/:-@\[-`{-~]"


def _norm_tokens(text_col: str):
    """StringTokenizer-on-whitespace + ``normalizeWord`` (strip ASCII
    punctuation, lowercase), ref ``NaiveBayesGenerate.java:45-47``.
    Pure-punctuation tokens normalize to "" and are KEPT, as in the
    reference (they become a vocabulary entry)."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )  # split("") yields [""], which StringTokenizer would not emit
    return F.transform(
        toks, lambda t: F.lower(F.regexp_replace(t, _PUNCT_CLASS, ""))
    )


def naive_bayes_train(
    df: DataFrame, label_col: str = "category", text_col: str = "text"
) -> DataFrame:
    """Fit the multinomial NB count model: (category, word, count) — the
    reference's INTERMEDIATE_SCHEMA, produced by one partial-aggregated
    groupBy instead of mapper + combiner + reducer. Token occurrences
    count multiplicities (no per-doc distinct)."""
    return (
        df.select(
            F.col(label_col).alias("category"),
            F.explode(_norm_tokens(text_col)).alias("word"),
        )
        .filter(F.col("word").isNotNull())
        .groupBy("category", "word")
        .agg(F.count(F.lit(1)).cast("int").alias("count"))
    )


def naive_bayes_classify(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classify with add-1 smoothing, ref
    ``NaiveBayesClassifier.java:79-99``: score(c) = Σ_tokens
    log((count(w,c) + 1) / (tokens_c + V)), argmax over categories.

    Scale shape — NO token × category fan-out: with add-1 smoothing an
    absent (word, category) pair contributes log(0+1) = 0, so

        score(c) = Σ_{matching tokens} log(count+1)  −  n_tokens·log(T_c+V)

    needs only an INNER join of the token stream against the broadcast
    model (present pairs) plus a per-DOC category grid (one row per
    (doc, category), built after aggregation — |docs|·|cats| rows, not
    |tokens|·|cats|). Log terms are summed as decimal(38,18) so the sum
    is order-independent (float addition is not associative; a shuffled
    cluster run must classify identically). Output: (id, category) with
    NULL for token-less documents.
    """
    cat_totals = model.groupBy("category").agg(F.sum("count").alias("__t__"))
    vocab = model.select(F.countDistinct("word").alias("__v__"))
    # per-category constant log(T_c + V): a single double (no sum, so no
    # ordering concern; the one n·logden multiply and the final subtract
    # are exact-rounded IEEE ops, identical on every engine)
    cat_const = cat_totals.crossJoin(F.broadcast(vocab)).select(
        "category",
        F.log((F.col("__t__") + F.col("__v__")).cast("double")).alias(
            "__logden__"
        ),
    )

    toks = docs.select(
        F.col(id_col), F.explode(_norm_tokens(text_col)).alias("word")
    )
    doc_n = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n__"))
    match_term = F.log((F.col("count") + F.lit(1)).cast("double")).cast(
        "decimal(38,18)"
    )
    match_sums = (
        toks.join(F.broadcast(model), "word")
        .groupBy(id_col, "category")
        .agg(F.sum(match_term).alias("__m__"))
    )
    grid = doc_n.crossJoin(F.broadcast(cat_const))
    sums = grid.join(match_sums, [id_col, "category"], "left").select(
        F.col(id_col),
        F.col("category"),
        (
            F.coalesce(F.col("__m__"), F.lit(0).cast("decimal(38,18)"))
            .cast("double")
            - F.col("__n__").cast("double") * F.col("__logden__")
        ).alias("__score__"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__score__").desc(), F.col("category").asc()
    )
    best = (
        sums.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select(id_col, "category")
    )
    return (
        docs.select(id_col)
        .join(best, id_col, "left")
        .select(id_col, F.col("category").alias("predicted"))
    )


def item_cf(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    min_co: int = 2,
    top_k: int = 10,
    max_user_items: "int | None" = None,
) -> DataFrame:
    """Item-item collaborative filtering (the classic Amazon/Linden
    neighborhood model, arXiv cs/0306092): cosine similarity between
    item rating vectors over the user axis,

        cos(i,j) = Σ_u r_ui·r_uj / (sqrt(Σ_u r_ui²) · sqrt(Σ_u r_uj²))

    keeping the ``top_k`` most similar neighbors per item among pairs
    co-rated by ≥ ``min_co`` users.

    Shape: ratings collapse to one row per (user, item) (summed — the
    merge also makes re-fed duplicate logs idempotent-by-sum), the pair
    dot-products come from ONE self-equi-join on the user key (never an
    item×item matrix), and the neighbor cut is a WindowGroupLimit
    rank-1..k heap per item. The candidate count is Σ_u c_u², bounded
    per user, not per catalog — ``max_user_items`` drops
    power-users above the cap (the standard blowup guard; a 100k-item
    bot account otherwise contributes 10¹⁰ pairs). NULL users, items,
    or ratings are dropped.

    Engine-portable with integer ratings: dots and norms are exact
    int64 sums and the cosine is ``dot / (sqrt(n_i)·sqrt(n_j))`` — a
    fixed IEEE chain, so results value-hash cross-engine (write the
    same op order in oracles).

    Output: (item, neighbor, co_users, cosine, rank), both directions
    of every surviving pair, rank 1..k per item by (cosine DESC,
    neighbor ASC).
    """
    if min_co < 1:
        raise ValueError(f"min_co must be >= 1, got {min_co}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    types = dict(interactions.dtypes)
    if types.get(rating_col) not in {"tinyint", "smallint", "int", "bigint"}:
        raise ValueError(
            f"rating_col {rating_col!r} must be integer-typed for exact "
            f"sums, got {types.get(rating_col)!r} — rescale upstream "
            "(e.g. half-star ratings to integer half-star units)"
        )
    r = (
        interactions.filter(
            F.col(user_col).isNotNull()
            & F.col(item_col).isNotNull()
            & F.col(rating_col).isNotNull()
        )
        .groupBy(F.col(user_col).alias("u"), F.col(item_col).alias("i"))
        .agg(F.sum(F.col(rating_col).cast("bigint")).alias("r"))
    )
    if max_user_items is not None:
        w = Window.partitionBy("u")
        r = r.withColumn("__ci__", F.count(F.lit(1)).over(w)).filter(
            F.col("__ci__") <= max_user_items
        ).drop("__ci__")
    # (u, i, r) feeds three branches (norms + both self-join sides);
    # materialized once, the upstream interaction join + groupBy run once
    # instead of three times. 24 bytes/row — the rating matrix is the
    # lightweight proxy here, never the raw interaction log.
    r = r.localCheckpoint(eager=True)
    norms = r.groupBy("i").agg(F.sum(F.col("r") * F.col("r")).alias("n2"))
    a = r.select(F.col("u"), F.col("i").alias("ia"), F.col("r").alias("ra"))
    b = r.select(F.col("u"), F.col("i").alias("ib"), F.col("r").alias("rb"))
    pairs = (
        a.join(b, "u")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(
            F.sum(F.col("ra") * F.col("rb")).alias("dot"),
            F.count(F.lit(1)).alias("co_users"),
        )
        .filter(F.col("co_users") >= min_co)
    )
    sym = pairs.select("ia", "ib", "dot", "co_users").unionByName(
        pairs.select(
            F.col("ib").alias("ia"),
            F.col("ia").alias("ib"),
            "dot",
            "co_users",
        )
    )
    na = norms.select(F.col("i").alias("ia"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("i").alias("ib"), F.col("n2").alias("nb2"))
    scored = (
        sym.join(na, "ia")
        .join(nb, "ib")
        .select(
            F.col("ia").alias("item"),
            F.col("ib").alias("neighbor"),
            "co_users",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                )
            ).alias("cosine"),
        )
    )
    wk = Window.partitionBy("item").orderBy(
        F.col("cosine").desc(), F.col("neighbor").asc()
    )
    return scored.withColumn("rank", F.row_number().over(wk)).filter(
        F.col("rank") <= top_k
    )


# ---------------------------------------------------------------------------
# k-means (fixed-iteration Lloyd's) — deterministic by construction


def _quantized(
    df: DataFrame, id_col: str, vec_col: str, scale: int, dim: int
) -> DataFrame:
    """(id, q array<long>) — embedding elements FLOOR(x·scale) as exact
    int64 coordinates. float→double cast, one exact-rounded multiply and
    a floor are bit-identical in every engine, so the quantized grid is
    the cross-engine contract everything downstream rides on. Rows with
    a NULL vector or the wrong dimensionality are dropped (documented:
    they have no position in the space)."""
    v = F.col(vec_col)
    return df.filter(v.isNotNull() & (F.size(v) == dim)).select(
        F.col(id_col),
        F.transform(
            v, lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long")
        ).alias("__q__"),
    )


def _dist2(qcol, centroid: "list[float]", dim: int):
    """Squared euclidean distance as a FIXED left-associated chain of 2·dim
    exact-rounded double ops — the expression order is the oracle contract
    (same association in SQL ⇒ bit-identical doubles).

    Implemented as a zip_with + left-fold aggregate over a literal
    centroid array rather than an unrolled 6·dim-node expression tree:
    the fold IS the same left-associated chain (the 0.0 seed is exact —
    every term is a square ≥ +0.0, and +0.0 + t == t bit-for-bit), but
    the tree is ~dim literal nodes instead of ~6·dim per centroid, which
    removes the analyze/codegen compile tax that dominated wall time for
    k·dim chains (measured: the k=4, dim=64 fit spent seconds per round
    compiling, milliseconds executing)."""
    carr = F.array(*[F.lit(float(centroid[d])) for d in range(dim)])
    sq = F.zip_with(
        qcol,
        carr,
        lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
    )
    return F.aggregate(sq, F.lit(0.0), lambda acc, t: acc + t)


def _with_assignment(df: DataFrame, centroids: "list[list[float]]", dim: int) -> DataFrame:
    """df + (cluster, dist2): argmin over k fixed-order distance chains;
    ties go to the LOWEST cluster index (array_position returns the first
    match — the oracle's ORDER BY dist2, j). The k·dim-term distance
    array is materialized in ONE projection and the argmin reads the
    column — writing array_min/array_position over the raw expression
    would re-expand all k·dim terms per use and the codegen compile of
    the duplicated tree dominated the sf0.1 wall time (measured)."""
    out = df.withColumn(
        "__darr__", F.array(*[_dist2(F.col("__q__"), c, dim) for c in centroids])
    )
    best = F.array_min(F.col("__darr__"))
    cluster = (F.array_position(F.col("__darr__"), best) - 1).cast("int")
    return out.withColumn("__dist2__", best).withColumn(
        "__cluster__", cluster
    ).drop("__darr__")


def kmeans_assign(
    df: DataFrame,
    centroids: "list[list[float]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared euclidean over
    the quantized grid) — the map-side, ZERO-shuffle half of k-means that
    at 100 TB runs over the full corpus while the fit ran on a sample.
    Centroids are plan literals. Output: (id_col, cluster int, dist2)."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    dim = len(centroids[0])
    q = _quantized(df, id_col, vec_col, scale, dim)
    a = _with_assignment(q, centroids, dim)
    return a.select(
        F.col(id_col),
        F.col("__cluster__").alias("cluster"),
        F.col("__dist2__").alias("dist2"),
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
    dim: int | None = None,
) -> "tuple[DataFrame, list[list[float]]]":
    """Fixed-iteration Lloyd's k-means with a FULL value oracle — the
    canonical iterative-MapReduce workload (the reference iterates by
    resubmitting jobs, ``EX/gameoflife`` pattern) as R rounds of one
    map-side assignment + one partial-combined aggregate.

    Deterministic by construction, unlike MLlib's seeded k-means|| (see
    ``similarity.kmeans_centroids``), so an unrolled-CTE oracle can
    replay every round:

    - coordinates are exact int64 on the FLOOR(x·scale) grid;
    - init = the k vectors with the smallest (portable md5 hash, id) —
      a content rule, not a partitioning accident;
    - distances are fixed-association double chains (bit-identical
      cross-engine); argmin ties break to the lowest cluster index;
    - centroid update is exact integer sums ÷ count, ONE exact-rounded
      double divide per dimension (the driver folds k·dim ints — the
      bounded-collect contract, k rows per round); per-dim |sum| is
      guarded < 2^53 so the int→double conversion is exact, raising
      with the rescale instruction otherwise;
    - an empty cluster keeps its previous centroid.

    The 100 TB shape: each round is one scan + one partial-combined
    aggregate of k·(dim+1) longs — no per-row state, no driver data
    paths beyond k centroid rows. Fit on a ``hash_sample`` and sweep the
    corpus once with ``kmeans_assign`` (zero shuffles) when the corpus
    is the bottleneck. Returns ``(assignments, centroids)``: the final
    (id, cluster, dist2) under the post-round centroids, and the
    centroid list.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    from pangool_spark.operators.dedup import base_hash_31

    if dim is None:
        row = df.filter(F.col(vec_col).isNotNull()).select(
            F.size(F.col(vec_col)).alias("d")
        ).first()
        if row is None:
            raise ValueError("cannot infer dim from an empty DataFrame")
        dim = row["d"]
    # Materialize the quantized grid once: seed selection, every round's
    # aggregate, and the final assignment are separate jobs that would
    # each re-scan and re-quantize the input otherwise. (At 100 TB the
    # documented path fits on a hash_sample, so this materializes the
    # sample, not the corpus.)
    q = _quantized(df, id_col, vec_col, scale, dim).localCheckpoint(
        eager=True
    )
    seeds = (
        q.select(
            "__q__", base_hash_31(F.col(id_col).cast("string")).alias("__h__"),
            F.col(id_col),
        )
        .orderBy("__h__", id_col)
        .limit(k)
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(f"k={k} exceeds the {len(seeds)} usable rows")
    centroids = [[float(x) for x in r["__q__"]] for r in seeds]
    for _ in range(iterations):
        sums = (
            _with_assignment(q, centroids, dim)
            .select(F.col("__cluster__").alias("__c__"), "__q__")
            .groupBy("__c__")
            .agg(
                F.count(F.lit(1)).alias("__n__"),
                *[
                    F.sum(F.get("__q__", d)).alias(f"__s{d}__")
                    for d in range(dim)
                ],
            )
            .collect()
        )
        nxt = list(centroids)
        for r in sums:
            s = [r[f"__s{d}__"] for d in range(dim)]
            if any(abs(x) >= 1 << 53 for x in s):
                raise ValueError(
                    "per-dimension coordinate sum exceeds 2^53 — the exact "
                    "int64→double conversion contract breaks; lower `scale` "
                    "or fit on a sample"
                )
            n = r["__n__"]
            nxt[r["__c__"]] = [float(x) / float(n) for x in s]
        centroids = nxt
    out = _with_assignment(q, centroids, dim).select(
        F.col(id_col),
        F.col("__cluster__").alias("cluster"),
        F.col("__dist2__").alias("dist2"),
    )
    return out, centroids


def cluster_topics(
    assign: DataFrame,
    docs: DataFrame,
    cluster_col: str = "cell",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 5,
    min_count: int = 5,
) -> DataFrame:
    """Distinctive terms per document cluster — the corpus-curation lens
    over any clustering (k-means cells, LSH buckets, source groups):
    for each cluster, the top-k terms by LIFT

        lift(t, c) = (n_tc / n_c) / (n_t / N)

    (share of the term inside the cluster over its corpus share — the
    log-free PMI variant, exact-ratio arithmetic so it value-oracles).
    ``min_count`` floors n_tc so one-off tokens can't top the list.

    Shape: one explode + two partial-combined aggregates (term×cluster,
    term) + a WindowGroupLimit top-k; cluster/corpus totals ride along as
    window sums over the small term×cluster relation. Nothing touches
    the corpus twice, nothing is per-pair.

    Output: (cluster, term, n, lift, rank), rank 1..top_k by lift DESC,
    term ASC tie-break.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    from pangool_spark.operators.norm import normalized_tokens

    joined = docs.join(
        assign.select(
            F.col(id_col), F.col(cluster_col).alias("__cluster__")
        ),
        id_col,
    )
    terms = joined.select(
        "__cluster__",
        F.explode(normalized_tokens(text_col)).alias("term"),
    ).filter(F.col("term") != "")
    tc = terms.groupBy("__cluster__", "term").agg(
        F.count(F.lit(1)).alias("n")
    )
    wc = Window.partitionBy("__cluster__")
    wt = Window.partitionBy("term")
    # corpus total as a broadcast 1-row relation, NOT a single-partition
    # window (which would funnel the whole term×cluster relation through
    # one task at scale)
    total = tc.agg(F.sum("n").alias("__N__"))
    scored = tc.select(
        "__cluster__",
        "term",
        "n",
        F.sum("n").over(wc).alias("__nc__"),
        F.sum("n").over(wt).alias("__nt__"),
    ).crossJoin(F.broadcast(total)).select(
        "__cluster__",
        "term",
        "n",
        (
            (F.col("n").cast("double") / F.col("__nc__").cast("double"))
            / (F.col("__nt__").cast("double") / F.col("__N__").cast("double"))
        ).alias("lift"),
    )
    w = Window.partitionBy("__cluster__").orderBy(
        F.col("lift").desc(), F.col("term").asc()
    )
    return (
        scored.filter(F.col("n") >= min_count)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("__cluster__").alias("cluster"), "term", "n", "lift", "rank"
        )
    )


def decision_stump(
    df: DataFrame,
    label_col: str,
    feature_cols: "list[str]",
) -> DataFrame:
    """Best single-feature threshold split (a depth-1 decision tree /
    1R classifier) for a BINARY integer label by weighted Gini impurity
    — the interpretable baseline and boosting weak learner:

        cost(t) = 2·aL(nL−aL)/nL + 2·aR(nR−aR)/nR,   split: x ≤ t

    (aX = positives, nX = rows on each side — the n-weighted Gini sum
    with the constant 1/n dropped; exact integer counts in, fixed IEEE
    chain out, so the chosen threshold AND its cost value-oracle).

    Shape per feature: one partial-combined aggregate collapses rows to
    DISTINCT feature values with (count, positives); cumulative counts
    come from ``global_running_sum`` (sample-sort prefix sums — never a
    single-partition window, the 100 TB discipline); the argmin is a
    per-feature WindowGroupLimit. Candidate thresholds are the distinct
    values except the maximum (an empty right side is not a split).

    Labels must be integer 0/1 (raise otherwise — the exactness
    contract); features integer-typed (rescale upstream).

    Output: one row per feature — (feature, threshold, n_left, n_right,
    pos_left, pos_right, cost); ties broken toward the smallest
    threshold.
    """
    if not feature_cols:
        raise ValueError("decision_stump needs at least one feature column")
    types = dict(df.dtypes)
    int_types = {"tinyint", "smallint", "int", "bigint"}
    if types.get(label_col) not in int_types:
        raise ValueError(
            f"decision_stump needs an integer 0/1 label; got "
            f"{types.get(label_col)!r}"
        )
    for c in feature_cols:
        if types.get(c) not in int_types:
            raise ValueError(
                f"decision_stump: feature {c!r} must be integer-typed; got "
                f"{types.get(c)!r} — rescale upstream (cents, millis)"
            )
    from pangool_spark.operators.partitioning import global_running_sum

    y = F.col(label_col).cast("bigint")
    guard = F.when(
        (y < 0) | (y > 1),
        F.raise_error(
            F.lit("decision_stump: label must be 0/1")
        ).cast("bigint"),
    ).otherwise(y)

    outs = []
    for c in feature_cols:
        vals = (
            df.select(F.col(c).cast("bigint").alias("v"), guard.alias("y"))
            .groupBy("v")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("y").alias("pos"),
            )
        )
        # Materialize the small distinct-values relation once: the
        # sample-sort machinery below issues several actions (count,
        # bound sample, offsets collect) that would each re-scan and
        # re-aggregate the full input otherwise (guide §1.3 rescans).
        vals = vals.localCheckpoint(eager=True)
        # Both prefix sums share one bucketing pass (same bounds, exact
        # integer carries — values identical to two chained calls).
        cum = global_running_sum(
            vals, ["v"], ["cnt", "pos"], ["n_left", "pos_left"]
        )
        tot = vals.agg(
            F.sum("cnt").alias("__n__"), F.sum("pos").alias("__a__")
        )
        s = cum.crossJoin(F.broadcast(tot)).filter(
            F.col("n_left") < F.col("__n__")  # max value is not a split
        )
        nl = F.col("n_left").cast("double")
        al = F.col("pos_left").cast("double")
        nr = (F.col("__n__") - F.col("n_left")).cast("double")
        ar = (F.col("__a__") - F.col("pos_left")).cast("double")
        cost = (2.0 * al * (nl - al)) / nl + (2.0 * ar * (nr - ar)) / nr
        scored = s.select(
            F.lit(c).alias("feature"),
            F.col("v").alias("threshold"),
            "n_left",
            (F.col("__n__") - F.col("n_left")).alias("n_right"),
            F.col("pos_left"),
            (F.col("__a__") - F.col("pos_left")).alias("pos_right"),
            cost.alias("cost"),
        )
        w = Window.partitionBy("feature").orderBy(
            F.col("cost").asc(), F.col("threshold").asc()
        )
        outs.append(
            scored.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def embedding_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
) -> DataFrame:
    """Per-label embedding-space drift between two dataset versions: the
    L2 shift of each label's CENTROID — 'did this class move' for
    retraining triggers and encoder-upgrade audits, the numeric sibling
    of ``category_drift``.

    Exact by the k-means grid contract: embeddings quantize to the
    FLOOR(x·scale) int64 grid, per-dim coordinate sums are exact ints,
    and the shift is computed CROSS-MULTIPLIED —

        shift² = Σ_d (sa_d·n_b − sb_d·n_a)² / (n_a·n_b)²

    with the numerator summed as decimal(38,0) over exact squares
    (order-independent) and ONE final sqrt+divide chain, so the drift
    value hash-matches cross-engine (no per-dim double centroids whose
    summation order could wobble).

    Shape: one posexplode + partial-combined (label, dim) aggregate per
    side, a co-partitioned join on (label, dim), one final aggregate —
    no window, no collect. Labels present on only one side are absent
    from the output (no centroid to compare).

    Output: (label, n_a, n_b, shift) — shift in ORIGINAL embedding units
    (the 1/scale is folded into the final divide).
    """
    if dim < 1 or scale < 1:
        raise ValueError(f"dim/scale must be >= 1, got {dim}/{scale}")

    def per_dim(d: DataFrame, n_out: str, s_out: str) -> DataFrame:
        q = _quantized(
            d.select(F.col(label_col).alias("label"), F.col(vec_col)),
            "label", vec_col, scale, dim,
        )
        return (
            q.select("label", F.posexplode("__q__").alias("dim", "__x__"))
            .groupBy("label", "dim")
            .agg(
                F.count(F.lit(1)).alias(n_out),
                F.sum("__x__").alias(s_out),
            )
        )

    a = per_dim(df_a, "n_a", "sa")
    b = per_dim(df_b, "n_b", "sb")
    joined = a.join(b, ["label", "dim"])
    num_term = (
        F.col("sa").cast("decimal(38,0)") * F.col("n_b")
        - F.col("sb").cast("decimal(38,0)") * F.col("n_a")
    )
    agg = joined.groupBy("label").agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.sum(num_term * num_term).alias("__num__"),
    )
    shift = F.sqrt(F.col("__num__").cast("double")) / (
        F.col("n_a").cast("double")
        * F.col("n_b").cast("double")
        * F.lit(float(scale))
    )
    return agg.select("label", "n_a", "n_b", shift.alias("shift"))


def ranking_metrics(
    df: DataFrame,
    query_col: str,
    rank_col: str,
    rel_col: str,
    k: int = 10,
    quantum: int = 1_000_000,
) -> DataFrame:
    """Per-query ranking quality: DCG@k / ideal-DCG@k / NDCG@k and the
    reciprocal rank of the first relevant item (MRR's per-query half) —
    the retrieval-eval companion of the classifier family (AUC / PR /
    calibration): "how good is the ordering this ranker produced",
    scored against graded relevance labels.

    Standard exponential-gain DCG::

        DCG@k  = Σ_{rank ≤ k} (2^rel − 1) / log2(rank + 1)
        IDCG@k = the same sum under the ideal ordering (rel desc,
                 original rank as the deterministic tie-break)
        NDCG@k = DCG@k / IDCG@k       (NULL when no item is relevant)

    ``rank_col`` must be a 1-based position, ``rel_col`` a non-negative
    integer grade (keep rel ≤ ~40 so 2^rel stays exact). Per-item DCG
    terms are quantized-summed (the ``infotheory`` contract: round(term
    · quantum) accumulated exactly) so per-query scores are order-
    independent and engine-replicable; NDCG rounds to 9 decimals; the
    reciprocal rank is one exact double division.

    One exchange on the query key (both windows and the final aggregate
    share it). Output: (query_col, n_items, dcg, idcg, ndcg, rr).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    gain = F.pow(F.lit(2.0), F.col(rel_col).cast("double")) - F.lit(1.0)
    log2 = lambda c: F.log(c) / F.log(F.lit(2.0))  # noqa: E731
    w_ideal = Window.partitionBy(query_col).orderBy(
        F.desc(rel_col), F.asc(rank_col)
    )
    staged = df.filter(
        F.col(rank_col).isNotNull() & F.col(rel_col).isNotNull()
    ).select(
        query_col,
        F.col(rank_col).cast("bigint").alias("__rank__"),
        F.col(rel_col).cast("bigint").alias("__rel__"),
        gain.alias("__gain__"),
        F.row_number().over(w_ideal).cast("bigint").alias("__irank__"),
    )
    q = F.lit(float(quantum))
    term = F.col("__gain__") / log2(F.col("__rank__").cast("double") + F.lit(1.0))
    iterm = F.col("__gain__") / log2(
        F.col("__irank__").cast("double") + F.lit(1.0)
    )
    qsum = lambda c: (  # noqa: E731
        F.sum(F.round(c * q).cast("decimal(38,0)")).cast("double")
    )
    agg = staged.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_items"),
        qsum(F.when(F.col("__rank__") <= k, term).otherwise(F.lit(0.0))).alias(
            "__sd__"
        ),
        qsum(
            F.when(F.col("__irank__") <= k, iterm).otherwise(F.lit(0.0))
        ).alias("__si__"),
        F.min(F.when(F.col("__rel__") > 0, F.col("__rank__"))).alias(
            "__fr__"
        ),
    )
    return agg.select(
        query_col,
        "n_items",
        (F.col("__sd__") / q).alias("dcg"),
        (F.col("__si__") / q).alias("idcg"),
        F.when(
            F.col("__si__") > 0.0,
            F.round(F.col("__sd__") / F.col("__si__"), 9),
        ).alias("ndcg"),
        F.when(
            F.col("__fr__").isNotNull(),
            F.lit(1.0) / F.col("__fr__").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("rr"),
    )


def uplift_deciles(
    df: DataFrame,
    treated_col: str,
    label_col: str,
    score_col: str,
    n_buckets: int = 10,
    bin_width: int = 1,
) -> DataFrame:
    """Uplift-by-decile (the Qini/uplift-curve table, Radcliffe 2007):
    rank units by a targeting score, cut into ``n_buckets``
    value-balanced buckets via EXACT quantile cuts
    (``partitioning.exact_quantile_cuts`` — never an ntile window over
    the rows), and per bucket report the treated−control response-rate
    gap plus the cumulative gap walking from the TOP scores down — "did
    the model find the people the treatment actually moves", the eval a
    raw AUC can't answer.

    ``treated_col`` is boolean, ``label_col`` 0/1, ``score_col`` integer
    (quantize upstream). All counts are exact ints from ONE conditional
    aggregate over the bucketed rows; rates and uplifts are single exact
    divides; the cumulative columns are integer window sums over the
    ≤``n_buckets``-row relation — everything hash-stable cross-engine.
    Ties land in the LOWER bucket (the exact_quantile_cuts contract), so
    duplicate cuts surface as missing buckets rather than arbitrary
    splits. Buckets are numbered with 0 = TOP scores. NULL
    treated/label/score rows are excluded. Uplift is NULL where either
    arm is empty.

    Output: (bucket, n_t, n_c, conv_t, conv_c, uplift, cum_uplift).
    """
    from pangool_spark.operators.partitioning import exact_quantile_cuts

    if dict(df.dtypes).get(score_col) not in {
        "tinyint", "smallint", "int", "bigint"
    }:
        raise ValueError(
            f"score_col must be integer-typed, got "
            f"{dict(df.dtypes).get(score_col)!r} — quantize upstream"
        )
    tr = F.col(treated_col)
    y = F.col(label_col).cast("bigint")
    s = F.col(score_col).cast("bigint")
    rows = df.filter(tr.isNotNull() & y.isin(0, 1) & s.isNotNull()).select(
        tr.alias("__t__"), y.alias("__y__"), s.alias("__s__")
    )
    cuts = exact_quantile_cuts(rows, "__s__", n_buckets, bin_width)
    asc = F.lit(0)
    for cv in cuts:
        asc = asc + F.when(F.col("__s__") > F.lit(cv), 1).otherwise(0)
    # bucket 0 = top scores (descending deciles)
    bucket = (F.lit(len(cuts)) - asc).cast("bigint")
    per = (
        rows.select(bucket.alias("bucket"), "__t__", "__y__")
        .groupBy("bucket")
        .agg(
            F.count(F.when(F.col("__t__"), F.lit(1))).alias("n_t"),
            F.count(F.when(~F.col("__t__"), F.lit(1))).alias("n_c"),
            F.coalesce(
                F.sum(F.when(F.col("__t__"), F.col("__y__"))), F.lit(0)
            ).alias("conv_t"),
            F.coalesce(
                F.sum(F.when(~F.col("__t__"), F.col("__y__"))), F.lit(0)
            ).alias("conv_c"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "bucket",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.sum("n_t").over(w).alias("__cnt__"),
        F.sum("n_c").over(w).alias("__cnc__"),
        F.sum("conv_t").over(w).alias("__cct__"),
        F.sum("conv_c").over(w).alias("__ccc__"),
    )
    rate = lambda c, n: F.when(  # noqa: E731
        F.col(n) > 0, F.col(c).cast("double") / F.col(n).cast("double")
    )
    return cum.select(
        "bucket",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        (rate("conv_t", "n_t") - rate("conv_c", "n_c")).alias("uplift"),
        (rate("__cct__", "__cnt__") - rate("__ccc__", "__cnc__")).alias(
            "cum_uplift"
        ),
    )


def classification_report(
    df: DataFrame,
    label_col: str,
    pred_col: str,
) -> DataFrame:
    """Confusion-matrix classification report — the basic supervised-eval
    relation the AUC/PR/calibration family sits on top of: per class,
    TP/FP/FN counts with precision/recall/F1, plus overall accuracy,
    macro-F1, and the multi-class Matthews correlation (Gorodkin's R_K,
    Comput Biol Chem 2004) repeated on every row so the relation is
    self-contained (the ``diff_in_diff`` convention).

    One contingency pass: ``groupBy(label, pred).count`` produces the
    ≤C² cell relation (localCheckpointed — the t_closeness lesson: every
    marginal below derives from it, and Catalyst would otherwise inline
    the full scan per marginal); marginals, the diagonal, and the
    overall statistics are joins/windows over that tiny relation, so the
    input scans once no matter how many classes. All counts are exact
    int64; R_K's cross terms (c·s − Σp_k·t_k, s² − Σp_k², s² − Σt_k²)
    are exact DECIMAL(38,0) products of the counts, so every double in
    the output is a fixed IEEE chain over exact integers (two sqrts —
    no other libm). Keep counts below 10¹⁹ (the decimal(19,0) cast).

    Conventions: classes = union of observed labels and predictions;
    precision/recall/F1 are 0.0 when their denominator is 0 (sklearn's
    ``zero_division=0``); macro-F1 averages over the class union; MCC is
    NULL when a denominator factor is 0 (single-class degenerate). NULL
    label or prediction rows are dropped — a row that cannot be placed
    in the matrix (``cohens_kappa`` instead treats NULL as a class; that
    operator rates two labelers, this one scores a classifier against
    ground truth).

    Output: one row per class — (class, tp, fp, fn, support, precision,
    recall, f1, accuracy, macro_f1, mcc).
    """
    types = dict(df.dtypes)
    if types.get(label_col) != types.get(pred_col):
        raise ValueError(
            f"label/pred types differ: {types.get(label_col)!r} vs "
            f"{types.get(pred_col)!r} — cast upstream"
        )
    cells = (
        df.filter(F.col(label_col).isNotNull() & F.col(pred_col).isNotNull())
        .groupBy(
            F.col(label_col).alias("__a__"), F.col(pred_col).alias("__p__")
        )
        .agg(F.count(F.lit(1)).alias("__o__"))
    )
    # ≤C² rows; every marginal below is an aggregate OF this relation.
    cells = cells.localCheckpoint(eager=True)
    return confusion_report_from_cells(cells, "__a__", "__p__", "__o__")


def confusion_report_from_cells(
    cells: DataFrame,
    label_col: str = "label",
    pred_col: str = "pred",
    count_col: str = "n",
) -> DataFrame:
    """Expression half of ``classification_report``: the per-class
    report derived from an ALREADY-AGGREGATED (label, pred, count) cell
    relation. Split out so incremental maintainers (the
    ``stream_confusion_monitor`` fold) emit their snapshots through the
    IDENTICAL expressions — stream == batch parity is then structural,
    not coincidental (the ``plan_from_counts`` pattern). Same output
    contract as ``classification_report``.
    """
    cells = cells.select(
        F.col(label_col).alias("__a__"),
        F.col(pred_col).alias("__p__"),
        F.col(count_col).cast("bigint").alias("__o__"),
    )
    truth = cells.groupBy(F.col("__a__").alias("class")).agg(
        F.sum("__o__").alias("support")
    )
    pred = cells.groupBy(F.col("__p__").alias("class")).agg(
        F.sum("__o__").alias("__pk__")
    )
    diag = cells.filter(F.col("__a__") == F.col("__p__")).select(
        F.col("__a__").alias("class"), F.col("__o__").alias("tp")
    )
    per = (
        truth.join(pred, "class", "full_outer")
        .join(diag, "class", "left")
        .select(
            "class",
            F.coalesce(F.col("tp"), F.lit(0)).cast("bigint").alias("tp"),
            F.coalesce(F.col("support"), F.lit(0)).cast("bigint").alias(
                "support"
            ),
            F.coalesce(F.col("__pk__"), F.lit(0)).cast("bigint").alias(
                "__pk__"
            ),
        )
        .select(
            "class",
            "tp",
            (F.col("__pk__") - F.col("tp")).alias("fp"),
            (F.col("support") - F.col("tp")).alias("fn"),
            "support",
            "__pk__",
        )
    )
    w = Window.partitionBy()  # ≤C rows
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    s = F.sum(dec(F.col("support"))).over(w).cast("decimal(19,0)")
    c = F.sum(dec(F.col("tp"))).over(w).cast("decimal(19,0)")
    spt = F.sum(
        (dec(F.col("__pk__")) * dec(F.col("support"))).cast("decimal(38,0)")
    ).over(w)
    spp = F.sum(
        (dec(F.col("__pk__")) * dec(F.col("__pk__"))).cast("decimal(38,0)")
    ).over(w)
    stt = F.sum(
        (dec(F.col("support")) * dec(F.col("support"))).cast("decimal(38,0)")
    ).over(w)
    num = ((c * s).cast("decimal(38,0)") - spt).cast("double")
    f1fac = ((s * s).cast("decimal(38,0)") - spp).cast("double")
    f2fac = ((s * s).cast("decimal(38,0)") - stt).cast("double")
    zr = lambda n_, d_: F.when(  # noqa: E731
        d_ > 0, n_.cast("double") / d_.cast("double")
    ).otherwise(F.lit(0.0))
    f1_col = zr(
        F.lit(2) * F.col("tp"),
        F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn"),
    )
    return per.select(
        "class",
        "tp",
        "fp",
        "fn",
        "support",
        zr(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision"),
        zr(F.col("tp"), F.col("tp") + F.col("fn")).alias("recall"),
        f1_col.alias("f1"),
        (c.cast("double") / s.cast("double")).alias("accuracy"),
        # quantize per-class F1 before the window sum: a raw double sum
        # depends on row arrival order (the nelson_aalen convention)
        (
            F.sum(
                F.round(f1_col * F.lit(1000000000.0)).cast("bigint")
            ).over(w)
            .cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
            / F.lit(1000000000.0)
        ).alias("macro_f1"),
        F.when(
            (f1fac > 0) & (f2fac > 0),
            num / (F.sqrt(f1fac) * F.sqrt(f2fac)),
        ).alias("mcc"),
    )
