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
