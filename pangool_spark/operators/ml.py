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
