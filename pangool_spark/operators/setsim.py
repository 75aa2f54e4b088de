"""Exact set-similarity join with prefix filtering (AllPairs / PPJoin:
Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
WWW 2007; Xiao, Wang, Lin & Yu, "Efficient Similarity Joins for Near
Duplicate Detection", WWW 2008) — all pairs of records whose TOKEN-SET
Jaccard similarity clears a threshold, candidates generated from an
inverted index over each record's RARE-TOKEN PREFIX only.

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
|x∩y| ≥ ⌈t/(1+t)·(|x|+|y|)⌉ ≥ t·min(|x|,|y|), and two sets whose
prefixes are disjoint can share at most min(⌈t|x|⌉, ⌈t|y|⌉) − 1 <
t·min(|x|,|y|) tokens — so every qualifying pair shares a PREFIX
token and survives the equi-join. The length filter
⌈t·|x|⌉ ≤ |y| ≤ ⌊|x|/t⌋ prunes the rest for free. Verification is
exact: the candidate pair joins its two full sorted token arrays and
counts the intersection JVM-side (array_intersect — tokens are
distinct by construction).

Scale shape: one aggregate for token frequencies (the order), one for
per-record sorted arrays, a prefix-token equi-join whose keys are
8-byte xxhash64 values, and a broadcast-friendly verify. No UDFs, no
driver collects; the frequency order is computed distributed and joined
back, never held in driver memory.
"""

from __future__ import annotations


from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaccard_selfjoin(
    df: DataFrame,
    id_col: str = "id",
    tokens_col: str = "tokens",
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs (id_a < id_b) with token-set Jaccard ≥ ``threshold``.

    ``tokens_col`` is an array column; duplicates within a record are
    collapsed (set semantics). Records with empty token sets match
    nothing. Output: (id_a, id_b, jaccard).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t = float(threshold)

    toks = (
        df.select(F.col(id_col).alias("__id__"), F.col(tokens_col).alias("__ts__"))
        .select("__id__", F.explode(F.array_distinct("__ts__")).alias("__tok__"))
        .filter(F.col("__tok__").isNotNull())
    )
    # global rarest-first order WITHOUT a global row_number (a
    # partition-less window is a single-task sort — the 100 TB
    # anti-pattern): the sort key is the struct (df, xxhash64(token)),
    # computed by one distributed aggregate and joined back. Struct
    # ordering is (df asc, hash asc) — rarest first, ties broken by a
    # fixed injective-modulo-2⁻⁶⁴ hash (the same collision class the
    # digest-dedup operators already document).
    freq = toks.groupBy("__tok__").agg(F.count(F.lit(1)).alias("__df__"))
    ranked = freq.select(
        "__tok__",
        F.struct(
            F.col("__df__").alias("d"), F.xxhash64("__tok__").alias("h")
        ).alias("__r__"),
    )

    # per-record rarest-first sorted key arrays + sizes
    rec = (
        toks.join(ranked, "__tok__")
        .groupBy("__id__")
        .agg(F.sort_array(F.collect_list("__r__")).alias("__arr__"))
        .select(
            "__id__", "__arr__", F.size("__arr__").alias("__n__")
        )
    )

    # prefix stream: first |r| - ceil(t*|r|) + 1 ranks of each record
    prefix_len = (
        F.col("__n__") - F.ceil(F.col("__n__") * F.lit(t)).cast("int") + F.lit(1)
    )
    prefixes = rec.select(
        "__id__",
        "__n__",
        F.explode(F.slice("__arr__", 1, prefix_len)).alias("__r__"),
    )
    pa = prefixes.select(
        F.col("__id__").alias("id_a"), F.col("__n__").alias("__na__"), "__r__"
    )
    pb = prefixes.select(
        F.col("__id__").alias("id_b"), F.col("__n__").alias("__nb__"), "__r__"
    )
    candidates = (
        pa.join(pb, "__r__")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # length filter: J >= t forces t*|x| <= |y| (both directions)
            & (F.col("__na__") * F.lit(t) <= F.col("__nb__"))
            & (F.col("__nb__") * F.lit(t) <= F.col("__na__"))
        )
        .select("id_a", "id_b")
        .distinct()
    )

    # exact verify on the full sorted rank arrays
    ra = rec.select(
        F.col("__id__").alias("id_a"),
        F.col("__arr__").alias("__aa__"),
        F.col("__n__").alias("__na__"),
    )
    rb = rec.select(
        F.col("__id__").alias("id_b"),
        F.col("__arr__").alias("__ab__"),
        F.col("__n__").alias("__nb__"),
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
                / (F.col("__na__") + F.col("__nb__") - inter).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t)
    )


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
