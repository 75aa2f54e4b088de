"""Text-analysis operators for training-data pipelines.

Pure extension over the reference (which only tokenizes with Java
StringTokenizer, ``EX/topicalwordcount/TopicalWordCount.java:73``). Every
operator here is built from native ``pyspark.sql.functions`` expressions —
JVM-side, whole-stage-codegen'd, zero Python in the row path — so they scale
to 100 TB document tables without Arrow transfer cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pangool_spark.operators.norm import normalized_text, normalized_tokens

# Tiny per-language stopword marker lists for the n-gram/stopword heuristic
# language id. Deliberately small + deterministic (no external model).
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "dans"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "en"],
    "it": ["il", "la", "che", "e", "di", "un", "per", "non"],
}

_EN_STOPWORDS = _LANG_MARKERS["en"] + ["a", "an", "it", "for", "on", "as", "are", "was"]

# A BPE-ish word/number/punctuation splitter: runs of letters, runs of
# digits, or single punctuation marks — a deterministic proxy for subword
# token counting.
_BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokenize(df: DataFrame, text_col: str = "text", out_col: str = "word") -> DataFrame:
    """Whitespace tokenize + explode: one row per token (empty tokens
    dropped). The reference's map-side StringTokenizer emit."""
    return df.select(
        "*", F.explode(F.split(F.col(text_col), r"\s+")).alias(out_col)
    ).filter(F.col(out_col) != "")


def token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document token counts: whitespace tokens + BPE-ish subword count."""
    ws_tokens = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    bpe_tokens = F.regexp_extract_all(F.col(text_col), F.lit(_BPE_REGEX), 0)
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(ws_tokens).alias("n_tokens"),
        F.size(bpe_tokens).alias("n_bpe_tokens"),
    )


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """Per-document TF-IDF terms: (id, term, tf, df_t, tf_idf) with
    tf = raw in-document count and tf_idf = tf · ln(N / df_t).

    Shuffle profile: one partial-aggregated shuffle for (doc, term) counts,
    one for document frequency, then an equi-join on term. Stop-word terms
    are the hot keys of that join — both aggregations pre-combine map-side
    so no task ever holds a hot term's raw occurrences, and AQE's skew-join
    splits the hot post-agg partitions. The corpus size N rides in via a
    broadcast one-row cross join, keeping the whole plan collect-free.
    ``top_k`` keeps only the k highest-scoring terms per document
    (tie-break on term) via WindowGroupLimit.
    """
    terms = (
        df.select(
            F.col(id_col),
            F.explode(normalized_tokens(text_col)).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(F.countDistinct(id_col).alias("__n_docs__"))
    scored = (
        terms.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df_t",
            (F.col("tf") * F.log(F.col("__n_docs__") / F.col("df_t"))).alias("tf_idf"),
        )
    )
    if top_k is not None:
        w = Window.partitionBy(id_col).orderBy(
            F.col("tf_idf").desc(), F.col("term").asc()
        )
        scored = (
            scored.withColumn("__rk__", F.row_number().over(w))
            .filter(F.col("__rk__") <= top_k)
            .drop("__rk__")
        )
    return scored


def quality_exprs(text_col: str = "text") -> "dict[str, Column]":
    """The quality metrics as named COLUMN expressions (see
    ``language_id_expr`` for why pipelines want expressions, not joins)."""
    text = F.col(text_col)
    tokens = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    n_tokens = F.size(tokens)
    stop_arr = F.array(*[F.lit(w) for w in _EN_STOPWORDS])
    n_stop = F.size(F.filter(tokens, lambda t: F.array_contains(stop_arr, t)))
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    n_chars = F.length(text)
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "space_ratio": (
            (n_chars - F.length(F.regexp_replace(text, r"\s", ""))).cast("double")
            / safe_chars
        ),
        "stopword_ratio": n_stop.cast("double") / safe_tokens,
        "alpha_ratio": n_alpha.cast("double") / safe_chars,
        "upper_ratio": n_upper.cast("double") / safe_chars,
    }


def quality_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic document quality: length, mean word length, stopword ratio,
    alpha ratio, uppercase ratio. All closed-form column expressions."""
    exprs = quality_exprs(text_col)
    return df.select(
        F.col(id_col), *[c.alias(name) for name, c in exprs.items()]
    )


def language_id_expr(text_col: str = "text") -> Column:
    """The language-ID prediction as a single COLUMN expression, so
    pipelines can compose it into an existing projection instead of
    joining ``language_id``'s output back to the source (a self-join on
    doc_id that shuffles the corpus twice for a per-row value)."""
    tokens = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")

    def hits(markers: Column) -> Column:
        return F.size(F.filter(tokens, lambda t: F.array_contains(markers, t)))

    scored = []
    for lang, ws in sorted(_LANG_MARKERS.items()):
        scored.append(
            F.struct(
                hits(F.array(*[F.lit(w) for w in ws])).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scored))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Stopword-marker language ID.

    Scores each language by the count of its marker words in the (lowercased,
    whitespace-split) token list; highest count wins, ties → the larger
    language code, zero matches → 'und'.

    Shape: entirely MAP-SIDE — per language, ``size(filter(tokens, t →
    array_contains(markers, t)))`` counts marker hits (multiplicity kept),
    and the argmax is ``array_max`` over (score, lang) structs, whose
    struct ordering (score first, then the larger lang code) encodes the
    tie-break. No explode, no join, no window, ZERO shuffles — the earlier
    explode→broadcast-join→window shape shuffled every token row on doc_id;
    at 100 TB that was the dominant subtree of the curation pipeline. The
    marker lists are constant-size array literals (~40 words total), so the
    per-token work is bounded and the whole operator is one projection.
    """
    return df.select(F.col(id_col), language_id_expr(text_col).alias(out_col))


# PII patterns kept to syntax with IDENTICAL semantics in Java regex
# (Spark) and RE2 (DuckDB/Go): character classes, bounded repetition, \b —
# no backreferences, no lookaround, so oracle parity is a dialect-safe
# claim, not luck.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "card": r"\b\d{16}\b",
    "phone": r"\+\d{7,15}\b",
}


def pii_redact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact common PII (emails, IPv4 addresses, 16-digit card numbers,
    international phone numbers) and count what was removed.

    Training-data-pipeline staple: a chain of ``regexp_replace`` calls —
    pure JVM-side column expressions, ZERO shuffles, so the operator is
    a map-only projection that scales to any corpus size. Redaction
    tokens (``<EMAIL>`` etc.) keep token positions stable for downstream
    tokenizers. Counts come from ``regexp_count`` on the ORIGINAL text so
    they are exact even when patterns overlap the redacted output.

    Output: (id, redacted, n_email, n_ipv4, n_card, n_phone).
    """
    text = F.col(text_col)
    redacted = text
    # order matters: emails before phones so the digits in a local part
    # can't be re-matched; each replacement target is a literal token
    for kind in ("email", "ipv4", "card", "phone"):
        redacted = F.regexp_replace(redacted, PII_PATTERNS[kind], f"<{kind.upper()}>")
    cols = [
        F.col(id_col),
        redacted.alias("redacted"),
    ]
    for kind in ("email", "ipv4", "card", "phone"):
        cols.append(
            F.regexp_count(text, F.lit(PII_PATTERNS[kind])).alias(f"n_{kind}")
        )
    return df.select(*cols)


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repetition-based quality signals (the Gopher-rules family): the
    fraction of duplicate tokens and duplicate word-bigrams per document.
    Heavily repetitive documents (boilerplate, keyword stuffing, generated
    spam) score high and get filtered before training.

    Pure array expressions — tokens and bigrams never explode into rows,
    so like ``quality_score`` this is a ZERO-shuffle projection: the
    100 TB cost is one scan.

    Output: (id, n_tokens, dup_token_ratio, dup_bigram_ratio) with ratios
    0.0 for documents too short to have duplicates.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    staged = df.select(F.col(id_col), toks.alias("__toks__"))
    n = F.size(F.col("__toks__"))
    # guard: sequence(0, n-2) runs DESCENDING when n < 2 — gate on n >= 2
    bigrams = F.when(
        n >= 2,
        F.expr(
            "transform(sequence(0, size(__toks__) - 2), "
            "i -> concat(__toks__[i], ' ', __toks__[i + 1]))"
        ),
    ).otherwise(F.expr("array()"))
    n_bi = F.size(bigrams)
    dup_tok = F.when(
        n > 1, (n - F.size(F.array_distinct(F.col("__toks__")))).cast("double") / n
    ).otherwise(F.lit(0.0))
    dup_bi = F.when(
        n_bi > 1, (n_bi - F.size(F.array_distinct(bigrams))).cast("double") / n_bi
    ).otherwise(F.lit(0.0))
    return staged.select(
        F.col(id_col),
        n.alias("n_tokens"),
        dup_tok.alias("dup_token_ratio"),
        dup_bi.alias("dup_bigram_ratio"),
    )


def lm_perplexity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Character-bigram language-model perplexity per document — the
    CCNet/FineWeb-style fluency signal (docs whose character transitions
    are improbable under the corpus's own statistics are noise/gibberish),
    self-trained in the same plan: no external model file.

    Two aggregation passes over exploded bigrams (both partial-combined
    map-side: the model is |alphabet|² rows, vanishing next to the corpus)
    build P(c₂|c₁) = cnt(c₁c₂)/cnt(c₁·); the tiny model broadcasts back
    onto the document bigram stream; per-doc avg ln P and its exp(-·)
    perplexity close the plan. The per-bigram model log-probs are
    QUANTIZED (``round(ln(nb/nc)·10⁹)`` BIGINTs — the unigram_kl
    pattern), so the per-doc sum is an exact order-independent integer
    and the score a fixed IEEE chain — value-oracle-able cross-engine
    (round-11; previously float-avg and rows-only). |qlp| ≤ ~2·10¹⁰ and
    the sum is per-DOC, so the 2⁵³ exactness bound holds for any
    document under ~4·10⁵ chars — document-length-bounded, not
    corpus-bounded.

    Output: (id, n_bigrams, avg_logprob, perplexity); documents shorter
    than 2 normalized chars are absent.
    """
    norm = normalized_text(text_col)
    # Bigrams via adjacent-slice zip of the char ARRAY — linear per doc.
    # (substr(i, 2) inside a positional transform is O(len) per call →
    # O(len²) per document, the exact trap the winnowing kernel fixed.)
    chars = F.split(F.col("__t__"), "")
    bigram_arr = F.zip_with(
        F.slice(chars, F.lit(1), F.size(chars) - 1),
        F.slice(chars, F.lit(2), F.size(chars) - 1),
        lambda a, b: F.concat(a, b),
    )
    doc_bg = (
        df.select(F.col(id_col), norm.alias("__t__"))
        .filter(F.length("__t__") >= 2)
        .select(F.col(id_col), F.explode(bigram_arr).alias("bigram"))
    )
    bg_counts = doc_bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("__nb__"))
    # |alphabet|² rows — checkpoint so the corpus aggregate doesn't get
    # re-inlined into every downstream branch (the checkpoint
    # discipline; prefix counts derive from THIS relation, not a second
    # corpus pass, so the whole plan reads the corpus exactly twice:
    # once for the model, once for the scoring join)
    bg_counts = bg_counts.localCheckpoint(eager=True)
    prefix_counts = (
        bg_counts.groupBy(F.substring("bigram", 1, 1).alias("__c1__"))
        .agg(F.sum("__nb__").alias("__nc__"))
    )
    model = bg_counts.join(
        prefix_counts, F.substring("bigram", 1, 1) == F.col("__c1__")
    ).select(
        "bigram",
        F.round(
            F.log(
                F.col("__nb__").cast("double") / F.col("__nc__").cast("double")
            )
            * F.lit(1.0e9)
        )
        .cast("bigint")
        .alias("__qlp__"),
    )
    per = (
        doc_bg.join(F.broadcast(model), "bigram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__qlp__").alias("__qsum__"),
        )
    )
    avg = (
        F.col("__qsum__").cast("double")
        / F.lit(1.0e9)
        / F.col("n_bigrams").cast("double")
    )
    return per.select(
        id_col,
        "n_bigrams",
        avg.alias("avg_logprob"),
        # exp is not correctly rounded (Java vs glibc drift by 1 ulp on
        # ~15% of inputs, measured) — round to 9 decimals, the
        # mixture_temperature engine-drift convention
        F.round(F.exp(-avg), 9).alias("perplexity"),
    )


def compression_quality(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document zlib compression ratio — the Gopher/FineWeb-family
    repetitiveness signal: machine-generated/boilerplate text compresses
    far below natural prose, so a low ratio flags low-quality documents.

    The one text-quality operator here that is NOT a closed-form column
    expression (deflate needs real LZ77): Arrow-batched Pandas UDF, still
    zero shuffles — a map-side projection like the rest of the family.
    Not SQL-oracle-able (no deflate in DuckDB); verified by ordering
    properties on constructed inputs instead.
    """
    from pangool_spark.operators._udfs import compression_ratio_udf

    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        compression_ratio_udf(F.col(text_col)).alias("compression_ratio"),
    )


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", out_col: str = "fingerprint"
) -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercase, collapsed whitespace) — the exact-dedup key. Content-defined
    rolling-hash chunking lives in ``dedup.shingle`` (n-gram shingles)."""
    normalized = normalized_text(text_col)
    return df.select(F.col(id_col), F.md5(normalized).alias(out_col))


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the standard
    context-window preparation for training/embedding pipelines.

    Chunks start every ``chunk_tokens - overlap`` whitespace tokens and
    carry ``chunk_tokens`` tokens each (last chunks may be shorter); chunk
    text is the tokens re-joined with single spaces (whitespace-normalized
    by construction). Fully declarative: split → sequence of starts →
    posexplode → slice/join; the fan-out is sized by Catalyst AFTER the
    explode, so huge documents spread across tasks.

    Output: (id, chunk_idx, chunk_start_token, n_chunk_tokens, chunk_text).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    tokens = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n = F.size(tokens)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    exploded = df.select(
        F.col(id_col),
        tokens.alias("__toks__"),
        F.posexplode(starts).alias("chunk_idx", "chunk_start_token"),
    )
    chunk = F.slice(F.col("__toks__"), F.col("chunk_start_token") + 1, chunk_tokens)
    return exploded.select(
        id_col,
        "chunk_idx",
        "chunk_start_token",
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (the MOSS scheme): hash every character
    k-gram of the normalized text, slide a ``window`` over consecutive
    k-gram hashes, select each window's minimum — the standard local
    document sketch for partial-overlap/plagiarism-style detection
    (guarantees any shared substring of length ≥ k+window-1 contributes a
    shared fingerprint).

    Execution: one Arrow-batched ``mapInPandas`` kernel computes, per
    document, the k-gram hash array (hashlib md5 — byte-identical to the
    portable SQL hash ``('0x'||substr(md5(g),1,8))::BIGINT & 0x7FFFFFFF``),
    the trailing window minima (numpy ``sliding_window_view`` over a
    MAX-padded head, so partial head windows match ``ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW``), and the per-doc distinct set. A document
    of length L costs O(L) bytes in one task — never one row per position:
    the naive explode-then-substring shape carried the full text per
    position row (O(L²) ≈ 1 TB of payload for a 1 MB doc), and the
    pure-expression form (``transform(sequence)`` + ``array_min(slice)``)
    evaluates higher-order lambdas interpreted, ~0.7 ms/char — both
    unusable at scale. The only exchange is the final global ``distinct``
    on the small (id, fp) output pairs.

    Output: (id, fp) distinct selected hashes.
    """
    import hashlib
    import re

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("fp", T.LongType(), False),
        ]
    )
    ws_re = re.compile(r"\s+")
    i64max = np.iinfo(np.int64).max

    def winnow(batches):
        md5 = hashlib.md5
        for pdf in batches:
            ids, fps, counts = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                t = ws_re.sub(" ", (text or "").lower()).strip()
                n = max(len(t) - (k - 1), 1)
                hs = np.empty(n + window - 1, dtype=np.int64)
                hs[: window - 1] = i64max  # pad head → partial-window minima
                for i in range(n):
                    hs[window - 1 + i] = (
                        int(md5(t[i : i + k].encode("utf-8")).hexdigest()[:8], 16)
                        & 0x7FFFFFFF
                    )
                mins = np.lib.stride_tricks.sliding_window_view(hs, window).min(axis=1)
                sel = np.unique(mins)
                ids.append(doc_id)
                fps.append(sel)
                counts.append(len(sel))
            yield pd.DataFrame(
                {
                    id_col: np.repeat(np.asarray(ids, dtype=object), counts),
                    "fp": np.concatenate(fps) if fps else np.array([], dtype=np.int64),
                }
            )

    # parallelize the Arrow kernel for compact sources only — at scale the
    # scan already has the partitions and this would shuffle corpus text
    proj = df.select(id_col, text_col)
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    if proj.rdd.getNumPartitions() < n_parts:
        proj = proj.repartition(n_parts)
    return proj.mapInPandas(winnow, schema=out_schema).distinct()


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """Cross-document LINE deduplication (the C4/Gopher boilerplate
    remover): a line whose trimmed content appears in at least
    ``min_docs`` DISTINCT documents is boilerplate (cookie banners,
    nav chrome, license headers) and every copy is removed;
    ``keep_first=True`` instead keeps the single copy in the
    lowest-``id_col`` document holding it. Surviving lines are
    reassembled in original order; documents whose every line was
    boilerplate survive with empty text (dropping docs is a separate
    curation decision). Blank lines are formatting, not content — they
    are kept and never counted.

    Scale shape: lines join on their md5 (portable, oracle-replicable —
    the ``content_digest`` convention) so corpus text never shuffles in
    the count/anti-join path; one distinct-count aggregate over
    (doc, line-hash), one anti-join (AQE chooses broadcast when the
    boilerplate set is small, which it is: hot lines are by definition
    few), one per-doc reassembly aggregate. All JVM expressions.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos__", "__line__"),
    ).withColumn("__key__", F.md5(F.trim(F.col("__line__"))))
    content = lines.filter(F.trim(F.col("__line__")) != "")

    per_doc = content.select(id_col, "__key__").distinct()
    counts = per_doc.groupBy("__key__").agg(
        F.count(F.lit(1)).alias("__n__"),
        F.min(id_col).alias("__first__"),
    )
    hot = counts.filter(F.col("__n__") >= min_docs)

    if keep_first:
        # drop hot lines everywhere EXCEPT the lowest-id holder
        doomed = hot.select("__key__", F.col("__first__").alias("__keep__"))
        survivors = lines.join(doomed, "__key__", "left").filter(
            F.col("__keep__").isNull()
            | (F.col(id_col) == F.col("__keep__"))
            | (F.trim(F.col("__line__")) == "")
        )
    else:
        blank = F.trim(F.col("__line__")) == ""
        survivors = lines.join(
            hot.select("__key__", F.lit(True).alias("__hot__")), "__key__", "left"
        ).filter(F.col("__hot__").isNull() | blank)

    rebuilt = (
        survivors.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos__", "__line__"))
                    ),
                    lambda s: s["__line__"],
                ),
                "\n",
            ).alias(text_col)
        )
    )
    # docs whose every line was removed (possible only when blank lines
    # are absent) come back with empty text via the left join
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(id_col, F.coalesce(F.col(text_col), F.lit("")).alias(text_col))
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Inverted index — THE canonical MapReduce job (map: (term, doc);
    reduce: sorted posting list), reference-era workload re-expressed as
    one partial-combined aggregate pair: per-term document frequency and
    the posting list [(doc_id, tf) ...] sorted by doc id.

    ``min_df``/``max_df`` prune hapax noise and stop-words at the REDUCE
    side (df bounds apply before the postings aggregate ships lists).
    The posting list for a term is O(df) — bounded by the same stop-term
    pruning every search engine applies; terms at corpus scale with
    million-doc postings should be max_df-pruned or delta-encoded
    downstream.

    Output: (term, df, postings array<struct<doc_id, tf>>).
    """
    tf = (
        df.select(
            F.col(id_col), F.explode(normalized_tokens(text_col)).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    bounds = dfreq.filter(F.col("df") >= min_df)
    if max_df is not None:
        bounds = bounds.filter(F.col("df") <= max_df)
    return (
        tf.join(bounds, "term")
        .groupBy("term", "df")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col).alias("doc_id"), "tf"))
            ).alias("postings")
        )
        .select("term", "df", "postings")
    )


def cooccurrence_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 2,
    min_count: int = 1,
) -> DataFrame:
    """Token co-occurrence counts within a ±``window`` token distance —
    the Lin & Dyer "pairs" pattern (the stripes/pairs chapter workload of
    the MapReduce era), the statistic behind PMI collocations and
    word-vector co-occurrence matrices.

    Pairs are emitted once per (position i, position j>i) with j−i ≤
    window, ordered (a ≤ b) so "x y" and "y x" accumulate together.
    Shape: one posexplode + a self-join on (doc, position band) would
    shuffle the corpus twice — instead each token LOOKS AHEAD inside its
    own row's token array (zero extra shuffle, the pair stream is built
    map-side) and one partial-combined aggregate counts. O(len·window)
    pair rows per doc.

    Output: (term_a, term_b, n) with term_a <= term_b.
    """
    # Materialize the token array as a projected column FIRST: referenced
    # unevaluated inside the nested lambda, the normalize+split expression
    # was re-evaluated at every token position (O(len^2) regex work per
    # document — measured 8.6s vs 1.2s for the whole pair pass at sf0.1).
    # CollapseProject leaves the alias alone because it is referenced
    # twice and is not cheap.
    toked = df.select(normalized_tokens(text_col).alias("__toks__"))
    toks = F.col("__toks__")
    pair_arrays = F.flatten(
        F.transform(
            toks,
            lambda t, i: F.transform(
                F.slice(toks, i + 2, window),
                lambda u: F.struct(
                    F.least(t, u).alias("term_a"),
                    F.greatest(t, u).alias("term_b"),
                ),
            ),
        )
    )
    pairs = (
        toked.select(F.explode(pair_arrays).alias("p"))
        .select("p.term_a", "p.term_b")
        .filter((F.col("term_a") != "") & (F.col("term_b") != ""))
    )
    out = pairs.groupBy("term_a", "term_b").agg(F.count(F.lit(1)).alias("n"))
    return out.filter(F.col("n") >= min_count)


def bm25_score(
    df: DataFrame,
    query_terms: "Sequence[str] | DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
) -> DataFrame:
    """Okapi BM25 retrieval scoring — the standard full-text ranking
    function over the same statistics ``tf_idf``/``inverted_index``
    build: score(d, q) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b +
    b·|d|/avgdl)), with the Lucene-style always-positive
    idf = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Shuffle profile: the (doc, term) tf aggregate and per-doc length are
    partial-combined; the tiny query-term relation broadcasts and FILTERS
    the term stream before any join fans out (only matching doc-terms
    reach the df join); N and avgdl ride along as a broadcast one-row
    relation (avgdl from exact integer sums — one deterministic divide).
    Per-term contributions are decimal(38,18)-summed per doc, so scores
    are identical under any partitioning. Docs matching no query term are
    absent (score 0 by omission). Output: (id, n_matched, score).
    """
    spark = df.sparkSession
    if not isinstance(query_terms, DataFrame):
        from pangool_spark.data import local_relation

        qdf = local_relation(
            spark, [(t,) for t in query_terms], "term STRING"
        )
    else:
        qdf = query_terms.select(F.col(query_terms.columns[0]).alias("term"))
    qdf = qdf.select(F.lower(F.trim(F.col("term"))).alias("term")).distinct()

    terms = (
        df.select(
            F.col(id_col), F.explode(normalized_tokens(text_col)).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doclen = terms.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    scalars = doclen.agg(
        F.count(F.lit(1)).alias("__n__"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("__avgdl__"),
    )
    docfreq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))

    matched = (
        terms.join(F.broadcast(qdf), "term")
        .join(docfreq, "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(scalars))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n__") - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
    )
    contrib = idf * (
        F.col("tf") * F.lit(k1 + 1.0)
    ) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl__"))
    )
    # deterministic double sum: fold the SORTED contribution list (per doc,
    # bounded by |query|). A decimal(38,18) roundtrip is NOT cross-engine
    # safe for values in [0.5, 1) — 18 fractional digits is fewer
    # significant digits than a double needs there, and Spark (shortest-
    # string) and DuckDB (exact-expansion) round the excess differently.
    scores = matched.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.aggregate(
            F.sort_array(F.collect_list(contrib)),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("score"),
    )
    if top_k is not None:
        # global top-k via orderBy+limit → TakeOrderedAndProject (a
        # distributed per-partition heap), never a partition-less window
        scores = scores.orderBy(
            F.col("score").desc(), F.col(id_col).asc()
        ).limit(top_k)
    return scores


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """End-to-end BM25 retrieval: score EVERY query in ``queries``
    against the corpus in one pass and keep the top ``top_k`` docs per
    query — the batch-retrieval shape (training-data dedup against a
    query set, eval-set retrieval, RAG index builds) rather than
    ``bm25_score``'s single ad-hoc query.

    Scale shape: corpus statistics (per-doc term frequencies, doc
    lengths, document frequencies, N/avgdl) are built ONCE and shared by
    all queries; the query relation is tokenized with the same
    normalizer, deduplicated per (query, term), and broadcast — the term
    stream is filtered by the inner join BEFORE any fan-out, so the
    joined cardinality is Σ_t df(t)·queries(t), never |corpus|×|queries|.
    Ranking is one row_number window per query partition
    (WindowGroupLimit: per-partition heaps, no global sort). Per-doc
    scores fold SORTED double contributions (partitioning-invariant);
    ranking compares scores rounded to 9 decimals so a 1-ulp
    transcendental difference (JVM Math.log vs libm) can never flip an
    engine-compared rank, with doc id as the total tie-break.

    Output: (query_id, id, rank, n_matched, score) — score rounded to
    9 decimals, rank 1-based.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(normalized_tokens(query_text_col)).alias("term"),
        )
        .distinct()
    )

    terms = (
        docs.select(
            F.col(id_col), F.explode(normalized_tokens(text_col)).alias("term")
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doclen = terms.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    scalars = doclen.agg(
        F.count(F.lit(1)).alias("__n__"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("__avgdl__"),
    )
    docfreq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))

    matched = (
        terms.join(F.broadcast(qterms), "term")
        .join(docfreq, "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(scalars))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n__") - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
    )
    contrib = idf * (
        F.col("tf") * F.lit(k1 + 1.0)
    ) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl__"))
    )
    scored = matched.groupBy("query_id", id_col).agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.round(
            F.aggregate(
                F.sort_array(F.collect_list(contrib)),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            9,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", id_col, "rank", "n_matched", "score")
    )


#: symbol delimiter for the BPE string representation — a control char
#: outside any sane corpus alphabet; inputs containing it are rejected
#: (a silent collision would corrupt merge boundaries)
_BPE_D = "\x01"


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
) -> "tuple[list[tuple[str, str, int]], DataFrame]":
    """Byte-pair-encoding MERGE TRAINING over a corpus — the tokenizer-
    building job every LLM data pipeline runs before anything else.
    Standard BPE (Sennrich et al. ACL'16): words become character
    sequences; each round counts adjacent symbol pairs weighted by word
    frequency, merges the most frequent pair greedily left-to-right in
    every word, repeats. Ties break deterministically: count DESC, then
    pair string ASC.

    Spark-first shape: the corpus collapses to a (word, count) relation
    ONCE (rounds never rescan documents); each round is one
    pair-explode aggregate + a 1-row driver argmax (bounded-collect
    contract) + one map-side literal substitution. Symbols live
    DELIMITER-WRAPPED in a single string (``\\x01t\\x01 \\x01h\\x01``),
    so adjacent pair occurrences share no characters and one
    left-to-right non-overlapping ``replace`` IS token-level greedy
    BPE — including the degenerate same-symbol pair on runs
    (property-verified against a token-list reference on 20k random
    cases). Both engines share these replace semantics, which is what
    makes a FULL value oracle of a tokenizer trainer possible (DuckDB
    replays the rounds as unrolled CTEs, computing each round's argmax
    pair and substitution in SQL).

    Returns ``(merges, segmented)``: the learned [(left, right, count)]
    merge list and the (word, n, segmented) relation — each distinct
    word's frequency and its space-joined segmentation after all
    merges.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    d = _BPE_D
    words = (
        df.select(F.explode(normalized_tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Materialize (word, count) once: every round's argmax collect — and
    # the delimiter guard below — is its own job, and without this each
    # re-tokenized the whole corpus (n_merges+1 full passes, measured).
    # |vocab| ≪ corpus, so this is the cheap side of the trade at any
    # scale, and it is what the docstring's "rounds never rescan
    # documents" promises. reliable_ok: the vocab is rebuilt from a full
    # corpus pass, so when a checkpoint dir is configured the durable
    # path is worth it (data.checkpoint_eager).
    from pangool_spark.data import checkpoint_eager

    words = checkpoint_eager(words, reliable_ok=True)
    if words.filter(F.col("w").contains(d)).limit(1).count():
        raise ValueError(
            "corpus contains the \\x01 BPE delimiter — strip control "
            "characters upstream"
        )
    # '\x01a\x01 \x01b\x01 ...' — every symbol delimiter-wrapped
    sym = F.rtrim(F.regexp_replace(F.col("w"), "(.)", f"{d}$1{d} ")).alias("s")
    cur = words.select("w", "n", sym)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        toks = F.split(F.col("s"), " ")
        pairs = cur.select(
            "n",
            F.explode(
                F.when(
                    F.size(toks) >= 2,
                    F.zip_with(
                        F.slice(toks, 1, F.size(toks) - 1),
                        F.slice(toks, 2, F.size(toks) - 1),
                        lambda a, b: F.concat(a, F.lit(" "), b),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), F.col("p").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, count = top[0]["p"], int(top[0]["c"])
        left, right = pair.split(" ", 1)
        l_sym = left.strip(d)
        r_sym = right.strip(d)
        merges.append((l_sym, r_sym, count))
        cur = cur.select(
            "w",
            "n",
            F.replace(
                F.col("s"), F.lit(f"{left} {right}"), F.lit(f"{d}{l_sym}{r_sym}{d}")
            ).alias("s"),
        )
    segmented = cur.select(
        "w", "n", F.replace(F.col("s"), F.lit(d), F.lit("")).alias("segmented")
    )
    return merges, segmented


def bpe_merges_local(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 32000,
    max_vocab: int = 5_000_000,
) -> "tuple[list[tuple[str, str, int]], DataFrame]":
    """Production BPE trainer: the SAME algorithm, tie-break, and greedy
    substitution contract as ``bpe_merges`` (parity-pinned on shared
    prefixes), but scale-shaped for real merge counts. ``bpe_merges``
    runs one distributed aggregate + a driver argmax PER MERGE — correct
    and fully value-oracled at small ``n_merges``, but 32,000 merges
    would be 32,000 sequential Spark jobs (hours of pure scheduling
    overhead at any data size). Every real tokenizer trainer instead
    exploits that after the one distributed (word, count) collapse the
    VOCABULARY is small (≪ corpus — millions of rows, not billions), so:

    1. ONE distributed pass collapses the corpus to distinct
       (word, count) — the only stage that touches the data, linear in
       corpus size, and the only stage that grows at 100 TB.
    2. The vocabulary collects to the driver under a guarded size
       contract (``max_vocab`` rows; raises naming the distributed
       fallback — the ``contamination_filter`` ``max_bench_shingles``
       pattern).
    3. All ``n_merges`` rounds run in-memory with INCREMENTAL pair
       counts and a lazy max-heap: each merge touches only the words
       containing the merged pair (indexed), never rescans the
       vocabulary — the Sennrich et al. ACL'16 reference shape.

    Determinism: argmax by (count DESC, delimiter-wrapped pair string
    ASC) — byte-order string comparison matches Spark's UTF8String
    ordering for valid UTF-8, so local and distributed training pick
    identical merges on every prefix (parity test).

    Returns ``(merges, segmented)`` exactly like ``bpe_merges``; the
    segmented relation is rebuilt as a DataFrame (vocab-sized, under the
    same guard).
    """
    import heapq
    from collections import Counter

    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    d = _BPE_D
    words_df = (
        df.select(F.explode(normalized_tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_vocab = words_df.count()
    if n_vocab > max_vocab:
        raise ValueError(
            f"vocabulary has {n_vocab} distinct words > max_vocab="
            f"{max_vocab}; raise the cap (driver memory permitting) or "
            "use the distributed trainer bpe_merges (one Spark job per "
            "merge — correct at any vocabulary size)"
        )
    rows = words_df.collect()
    spark = df.sparkSession

    freqs: "list[int]" = []
    segs: "list[list[str]]" = []
    for r in rows:
        if d in r["w"]:
            raise ValueError(
                "corpus contains the \\x01 BPE delimiter — strip control "
                "characters upstream"
            )
        freqs.append(int(r["n"]))
        segs.append(list(r["w"]))

    def _wrapped(p: "tuple[str, str]") -> str:
        return f"{d}{p[0]}{d} {d}{p[1]}{d}"

    pair_counts: "Counter[tuple[str, str]]" = Counter()
    pair_words: "dict[tuple[str, str], set[int]]" = {}
    for wi, t in enumerate(segs):
        n = freqs[wi]
        for p in zip(t, t[1:]):
            pair_counts[p] += n
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-c, _wrapped(p), p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: "list[tuple[str, str, int]]" = []
    for _ in range(n_merges):
        best = None
        while heap:
            negc, _, p = heapq.heappop(heap)
            if pair_counts.get(p, 0) == -negc:  # else stale: discard
                best = (p, -negc)
                break
        if best is None:
            break
        (l, r), c = best
        merges.append((l, r, c))
        merged = l + r
        # touch ONLY the words indexed under this pair (the set may hold
        # stale ids whose pair already vanished — their diff is zero)
        for wi in pair_words.pop((l, r), ()):
            t = segs[wi]
            n = freqs[wi]
            out, i, changed = [], 0, False
            while i < len(t):
                if i + 1 < len(t) and t[i] == l and t[i + 1] == r:
                    out.append(merged)
                    i += 2
                    changed = True
                else:
                    out.append(t[i])
                    i += 1
            if not changed:
                continue
            diff: "Counter[tuple[str, str]]" = Counter()
            for p in zip(t, t[1:]):
                diff[p] -= n
            for p in zip(out, out[1:]):
                diff[p] += n
            segs[wi] = out
            for p, delta in diff.items():
                if delta == 0:
                    continue
                new_c = pair_counts[p] + delta
                if new_c <= 0:
                    pair_counts.pop(p, None)
                else:
                    pair_counts[p] = new_c
                    heapq.heappush(heap, (-new_c, _wrapped(p), p))
                if delta > 0:
                    pair_words.setdefault(p, set()).add(wi)
        pair_counts.pop((l, r), None)

    from pangool_spark.data import local_relation

    segmented = local_relation(
        spark,
        [(rows[wi]["w"], freqs[wi], " ".join(segs[wi]))
         for wi in range(len(rows))],
        "w STRING, n BIGINT, segmented STRING",
    )
    return merges, segmented


def bpe_encode(
    df: DataFrame,
    merges: "Sequence[tuple[str, str]]",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a TRAINED BPE merge list (``bpe_merges``'s output, or any
    tokenizer's merge table) to encode a corpus — the other half of the
    tokenizer lifecycle: merges are applied in RANK ORDER, each one a
    greedy left-to-right substitution over the delimiter-wrapped symbol
    string (the exact ``bpe_merges`` substitution contract, including
    same-symbol runs), which is precisely how BPE encoding is defined
    (Sennrich et al. ACL'16 §3).

    The 100 TB shape: the corpus collapses to DISTINCT words first, the
    merge chain runs once per vocabulary entry (|vocab| ≪ corpus — the
    chain is K map-side literal replaces, no shuffle), and documents
    re-assemble by joining words back on the token key and sorting by
    word position — so doubling the corpus does not double the encode
    work, only the final join. The merge list itself ships as plan
    literals: zero broadcast state.

    Output: (id_col, n_tokens, encoded) — token count after merges and
    the space-joined token string; documents whose normalized text has
    no tokens are absent (nothing to encode).
    """
    if not merges:
        raise ValueError("merges must be non-empty")
    d = _BPE_D
    for pair in merges:
        left, right = pair
        if not left or not right or " " in left + right or d in left + right:
            raise ValueError(f"bad merge pair: {pair!r}")
    words = df.select(
        F.col(id_col),
        F.posexplode(normalized_tokens(text_col)).alias("pos", "w"),
    )
    vocab = words.select("w").distinct()
    if vocab.filter(F.col("w").contains(d)).limit(1).count():
        raise ValueError(
            "corpus contains the \\x01 BPE delimiter — strip control "
            "characters upstream"
        )
    s = F.rtrim(F.regexp_replace(F.col("w"), "(.)", f"{d}$1{d} "))
    for left, right in merges:
        s = F.replace(
            s,
            F.lit(f"{d}{left}{d} {d}{right}{d}"),
            F.lit(f"{d}{left}{right}{d}"),
        )
    seg = F.replace(s, F.lit(d), F.lit(""))
    enc = vocab.select(
        "w",
        seg.alias("__seg__"),
        F.size(F.split(seg, " ")).alias("__nt__"),
    )
    return (
        words.join(enc, "w")
        .groupBy(id_col)
        .agg(
            F.sum("__nt__").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "__seg__"))
                    ),
                    lambda x: x["__seg__"],
                ),
                " ",
            ).alias("encoded"),
        )
    )


def bpe_token_ids(
    df: DataFrame,
    merges: "Sequence[tuple[str, str]]",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The last third of the tokenizer lifecycle (train ``bpe_merges`` →
    encode ``bpe_encode`` → NUMBER): map every encoded token to a dense
    integer id under the canonical frequency-ranked vocabulary order
    (corpus count DESC, token ASC — the order real tokenizers assign ids
    in, so frequent tokens get small ids), emitting the id sequences a
    training pipeline actually ships.

    The vocabulary id assignment uses ``stable_row_ids`` (sample-sort
    ranking) — never a global ``row_number`` window, which would
    serialize the vocabulary through one task; everything else is one
    token explode, one count aggregate and one join back on the token.

    Output: (id_col, pos, token, token_id) — one row per token position,
    ``pos`` 0-based within the document's encoded sequence, ids dense
    1..|vocab|. Documents with no tokens are absent (the ``bpe_encode``
    contract).
    """
    from pyspark.sql import Window

    from pangool_spark.operators.partitioning import stable_row_ids

    # Same merge-chain-over-distinct-words plumbing as bpe_encode, but the
    # token stream is built DIRECTLY from per-word segmentations — never
    # reassembled into per-document strings and re-split (measured at the
    # 10× probe: the collect_list reassembly + resplit cost 164 s for 16M
    # tokens; this path cuts it ~20×). Global token position = the
    # running sum of preceding words' token counts (one per-doc window
    # over WORDS, not tokens) + the within-word index.
    if not merges:
        raise ValueError("merges must be non-empty")
    d = _BPE_D
    for pair in merges:
        left, right = pair
        if not left or not right or " " in left + right or d in left + right:
            raise ValueError(f"bad merge pair: {pair!r}")
    words = df.select(
        F.col(id_col),
        F.posexplode(normalized_tokens(text_col)).alias("__wpos__", "w"),
    )
    # distinct words materialized once: the delimiter guard is an action
    # and the merge chain consumer would otherwise re-tokenize the corpus
    wvocab = words.select("w").distinct().localCheckpoint(eager=True)
    if wvocab.filter(F.col("w").contains(d)).limit(1).count():
        raise ValueError(
            "corpus contains the \\x01 BPE delimiter — strip control "
            "characters upstream"
        )
    s = F.rtrim(F.regexp_replace(F.col("w"), "(.)", f"{d}$1{d} "))
    for left, right in merges:
        s = F.replace(
            s,
            F.lit(f"{d}{left}{d} {d}{right}{d}"),
            F.lit(f"{d}{left}{right}{d}"),
        )
    seg = F.replace(s, F.lit(d), F.lit(""))
    enc = wvocab.select(
        "w",
        seg.alias("__seg__"),
        F.size(F.split(seg, " ")).alias("__nt__"),
    )
    wt = words.join(enc, "w")
    win = (
        Window.partitionBy(id_col)
        .orderBy("__wpos__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wt = wt.withColumn(
        "__base__", F.coalesce(F.sum("__nt__").over(win), F.lit(0))
    )
    toks = wt.select(
        F.col(id_col),
        F.col("__base__"),
        F.posexplode(F.split(F.col("__seg__"), " ")).alias("__i__", "token"),
    ).select(
        F.col(id_col),
        (F.col("__base__") + F.col("__i__")).cast("int").alias("pos"),
        F.col("token"),
    )
    # Materialize the token stream once: the vocabulary ranking below
    # (stable_row_ids = count + sample + offsets, three jobs) and the
    # final join each re-ran the tokenize+join+window+explode pipeline
    # otherwise (~6 full passes, measured). O(corpus) executor storage
    # traded against O(n_jobs x corpus) recompute — THE relation whose
    # localCheckpoint fragility matters at 100 TB, so it takes the
    # reliable path whenever a checkpoint dir is configured
    # (data.checkpoint_eager).
    from pangool_spark.data import checkpoint_eager

    toks = checkpoint_eager(toks, reliable_ok=True)
    tvocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("__n__"))
        .localCheckpoint(eager=True)
    )
    ids = stable_row_ids(
        tvocab.withColumn("__negn__", -F.col("__n__")),
        ["__negn__", "token"],
        id_col="token_id",
    ).select("token", "token_id")
    return toks.join(F.broadcast(ids), "token").select(
        id_col, "pos", "token", "token_id"
    )


def hashed_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    signed: bool = True,
) -> DataFrame:
    """The hashing trick (Weinberger et al. ICML'09): fixed-``dim``
    sparse count features with NO vocabulary state — index =
    portable_hash(token) mod dim, sign = the next hash bit, value =
    signed token count per (doc, index). The featurizer that never
    needs a fit pass, a broadcast vocab, or a schema migration when new
    tokens appear — which is why it is the default at 100 TB.

    Portable by construction (``base_hash_31`` — md5-replicable in any
    engine), so the whole featurization value-oracles. One map-side
    token explode + one partial-combined aggregate; zero-row features
    (signed counts cancelling to 0) are kept — dropping them would make
    the feature's presence data-dependent.

    Output: (id_col, idx int, value bigint), sparse — absent (doc, idx)
    pairs are implicit zeros.
    """
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    from pangool_spark.operators.dedup import base_hash_31

    toks = df.select(
        F.col(id_col), F.explode(normalized_tokens(text_col)).alias("tok")
    )
    h = base_hash_31(F.col("tok"))
    idx = (h % dim).cast("int")
    if signed:
        # exact integer division via the mod trick (the chunk_documents
        # lesson): a double divide can mis-floor near-integer quotients
        # for non-power-of-2 dims and silently disagree with the
        # oracle's integer `//`
        q = (h - h % dim) / dim
        val = F.when(q.cast("long") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    else:
        val = F.lit(1)
    return (
        toks.select(F.col(id_col), idx.alias("idx"), val.alias("__v__"))
        .groupBy(id_col, "idx")
        .agg(F.sum("__v__").alias("value"))
    )


def bigram_lm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """WORD-bigram language-model training — the KenLM-style counting
    job every corpus pipeline runs (the model ``lm_perplexity`` style
    scorers consume, but at the word level and with the model itself as
    the output): bigram counts, prefix (first-word) continuation
    totals, and the conditional MLE P(w₂|w₁) = n/n_prefix.

    Bigrams come from an adjacent-slice ``zip_with`` over each doc's
    normalized token array (linear per doc, never a positional
    self-join), then ONE partial-combined aggregate per relation —
    model size is |bigram vocab|, vanishing next to the corpus.
    ``min_count`` prunes rare bigrams at the reduce side (counts stay
    exact; prefix totals are computed BEFORE pruning, so probabilities
    keep summing to ≤1 per prefix). The probability is a single
    exact-rounded divide of exact int64 counts — fully value-oracled.

    Output: (w1, w2, n, n_prefix, prob).
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = normalized_tokens(text_col)
    pairs = F.zip_with(
        F.slice(toks, F.lit(1), F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, F.lit(2), F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = df.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    prefix = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("n_prefix"))
    return (
        counts.filter(F.col("n") >= min_count)
        .join(prefix, "w1")
        .select(
            "w1",
            "w2",
            "n",
            "n_prefix",
            (F.col("n").cast("double") / F.col("n_prefix").cast("double")).alias(
                "prob"
            ),
        )
    )


def vocab_coverage(
    df: DataFrame,
    ks: "Sequence[int]",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary COVERAGE curve — the choose-the-vocab-size analysis
    behind every tokenizer design: for each candidate size K, the
    fraction of all corpus token OCCURRENCES covered by the K most
    frequent token types (the complement is the OOV rate a K-entry
    vocabulary would pay). Token types rank by (count DESC, token ASC)
    via sample-sort ``stable_row_ids`` — never a global window — and
    each K is one conditional sum over the VOCAB-sized relation, so the
    whole curve costs one corpus aggregate + one vocab pass regardless
    of how many K values are probed.

    Exact integer counts; coverage is a single exact-rounded divide.
    Output: one row per K — (k, covered, total, coverage), K values
    exceeding the vocabulary cover everything.
    """
    if not ks:
        raise ValueError("ks must be non-empty")
    if any(k < 1 for k in ks):
        raise ValueError(f"all ks must be >= 1, got {sorted(ks)}")
    from pangool_spark.operators.partitioning import stable_row_ids

    toks = df.select(F.explode(normalized_tokens(text_col)).alias("token"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("__n__"))
    ranked = stable_row_ids(
        vocab.withColumn("__negn__", -F.col("__n__")),
        ["__negn__", "token"],
        id_col="__rank__",
    )
    agg = ranked.agg(
        F.sum("__n__").alias("total"),
        *[
            F.sum(F.when(F.col("__rank__") <= k, F.col("__n__")).otherwise(0))
            .alias(f"__c{i}__")
            for i, k in enumerate(sorted(set(ks)))
        ],
    )
    rows = []
    for i, k in enumerate(sorted(set(ks))):
        rows.append(
            F.struct(
                F.lit(k).alias("k"),
                F.col(f"__c{i}__").alias("covered"),
                F.col("total").alias("total"),
                (
                    F.col(f"__c{i}__").cast("double")
                    / F.col("total").cast("double")
                ).alias("coverage"),
            )
        )
    return agg.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.k", "r.covered", "r.total", "r.coverage"
    )


def phrase_search(
    df: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase retrieval over a POSITIONAL index — the IR primitive
    ``inverted_index`` (df/tf postings) cannot answer: find documents
    where the phrase's tokens appear contiguously, in order.

    Shape: one posexplode builds the (doc, position, term) stream; each
    phrase term k filters its OWN slice of the stream (selectivity of
    that term — the rare-term slice is tiny) and the slices intersect on
    (doc, start_position) via m−1 equi-joins with the position shifted by
    k. Only term-matching positions ever shuffle; the corpus text never
    does. At 100 TB this is the standard positional-intersection query
    plan every search engine runs — for standing query workloads,
    materialize the positional index once (``write_bucketed`` on doc) and
    the joins co-locate.

    Output: (id, n_matches, first_pos) — first_pos is the 1-based token
    position of the first occurrence; docs without the phrase are absent.
    """
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("phrase_search needs a non-empty phrase")
    tok = df.select(
        F.col(id_col),
        F.posexplode(normalized_tokens(text_col)).alias("__pos__", "__term__"),
    )
    base = tok.filter(F.col("__term__") == terms[0]).select(
        id_col, F.col("__pos__").alias("__start__")
    )
    for k, t in enumerate(terms[1:], start=1):
        nxt = tok.filter(F.col("__term__") == t).select(
            id_col, (F.col("__pos__") - k).alias("__start__")
        )
        base = base.join(nxt, [id_col, "__start__"])
    return base.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_matches"),
        (F.min("__start__") + 1).alias("first_pos"),
    )


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_len: int = 3,
    mask_denominator: int = 5,
) -> DataFrame:
    """T5/UL2-style SPAN CORRUPTION pairs (Raffel et al., JMLR'20) — the
    denoising-pretraining data prep: tokens are grouped into fixed
    ``span_len`` spans, a deterministic 1-in-``mask_denominator`` of
    spans is masked, the input text replaces each masked span with a
    ``<extra_id_K>`` sentinel, and the target lists each sentinel
    followed by the tokens it hides.

    RNG-free by design (the repo-wide sampler contract): span s of doc d
    masks iff md5(d ‖ ':' ‖ s) mod denominator == 0 — reruns, retries,
    and both engines of the oracle agree on every mask. Sentinels are
    numbered K = 0.. in span order per document.

    Shape: one posexplode + ONE window pass on the doc key (sentinel
    numbering = dense_rank over masked spans) + one groupBy rebuilding
    both texts from position-sorted collect_lists — two keyed shuffles,
    no per-row quadratic span scans (an array-only build would cost
    O(spans²) per row at long documents).

    Output: (id, n_tokens, n_masked_spans, input_text, target_text) —
    unmasked docs keep input == normalized text and empty target.
    """
    if span_len < 1:
        raise ValueError(f"span_len must be >= 1, got {span_len}")
    if mask_denominator < 2:
        raise ValueError(
            f"mask_denominator must be >= 2, got {mask_denominator}"
        )
    tok = df.select(
        F.col(id_col),
        F.posexplode(normalized_tokens(text_col)).alias("pos", "tok"),
    ).withColumn("span", (F.col("pos") / span_len).cast("int"))
    hash32 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"), F.lit(":"),
                    F.col("span").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    tok = tok.withColumn("masked", hash32 % mask_denominator == 0)

    # sentinel K per masked span: dense_rank over masked spans only
    ranked = tok.withColumn(
        "k",
        F.when(
            F.col("masked"),
            F.dense_rank().over(
                Window.partitionBy(id_col, "masked").orderBy("span")
            )
            - 1,
        ),
    )
    first_in_span = F.col("pos") % span_len == 0
    sentinel = F.concat(F.lit("<extra_id_"), F.col("k"), F.lit(">"))
    in_piece = F.when(~F.col("masked"), F.col("tok")).when(
        F.col("masked") & first_in_span, sentinel
    )
    # target pieces: sentinel sorts before its span tokens via a (span,
    # order, pos) struct key
    tgt_tok = F.when(F.col("masked"), F.col("tok"))
    agg = ranked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct(F.when(F.col("masked"), F.col("span"))).alias(
            "n_masked_spans"
        ),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            in_piece.isNotNull(),
                            F.struct(F.col("pos"), in_piece.alias("p")),
                        )
                    )
                ),
                lambda s: s["p"],
            ),
        ).alias("input_text"),
        F.concat_ws(
            " ",
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("masked"),
                                F.struct(
                                    F.col("pos"),
                                    F.when(first_in_span, sentinel).alias("s"),
                                    tgt_tok.alias("t"),
                                ),
                            )
                        )
                    ),
                    lambda x: F.filter(
                        F.array(x["s"], x["t"]), lambda v: v.isNotNull()
                    ),
                )
            ),
        ).alias("target_text"),
    )
    return agg.select(
        id_col, "n_tokens", "n_masked_spans", "input_text", "target_text"
    )


def collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 2,
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Collocation mining — the strongest word associations by exact-ratio
    lift over the co-occurrence pair space:

        lift(a,b) = n_ab · N / (c_a · c_b)

    with n_ab the (a ≤ b) pair count within ±``window`` tokens, c_x the
    number of pair SLOTS containing x, and N the total pair count — the
    log-free PMI ordering (log is monotone, so lift ranks identically to
    PMI while staying exact-int + one divide, value-oracle-able).

    Shape: the map-side pair stream from ``cooccurrence_pairs`` (zero
    shuffles before its count aggregate), slot marginals as one more
    aggregate over the PAIR relation (never re-touching the corpus),
    total as a broadcast 1-row relation, global top-k via TakeOrdered
    per-partition heaps (no single-partition window).

    Output: (term_a, term_b, n, lift), top_k by lift DESC with
    (term_a, term_b) ascending tie-break.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    # The aggregated pair relation feeds four consumers below, but the
    # four subtrees are canonically identical, so AQE's runtime stage
    # reuse already computes the corpus pass once — an eager
    # localCheckpoint here measured SLOWER (8.4s vs 6.5s at sf0.1: it
    # blocks pipelining and pays an extra materialization).
    pairs = cooccurrence_pairs(
        df, id_col=id_col, text_col=text_col, window=window, min_count=1
    )
    slots = (
        pairs.select(F.col("term_a").alias("term"), F.col("n"))
        .unionByName(pairs.select(F.col("term_b").alias("term"), F.col("n")))
        .groupBy("term")
        .agg(F.sum("n").alias("c"))
    )
    total = pairs.agg(F.sum("n").alias("__N__"))
    scored = (
        pairs.filter(F.col("n") >= min_count)
        .join(slots.select(F.col("term").alias("term_a"), F.col("c").alias("__ca__")), "term_a")
        .join(slots.select(F.col("term").alias("term_b"), F.col("c").alias("__cb__")), "term_b")
        .crossJoin(F.broadcast(total))
        .select(
            "term_a",
            "term_b",
            "n",
            (
                (F.col("n").cast("double") * F.col("__N__").cast("double"))
                / (F.col("__ca__").cast("double") * F.col("__cb__").cast("double"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), F.col("term_a").asc(), F.col("term_b").asc()
    ).limit(top_k)


def textrank_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 2,
    iterations: int = 3,
    min_count: int = 2,
    top_k: int = 25,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04) over the
    whole corpus: tokens are vertices, co-occurrence within ±``window``
    positions is an (undirected) edge, and PageRank centrality ranks the
    keywords — the graph-centrality keyword scorer beside the frequency
    family (tf_idf picks DISTINCTIVE terms, collocations picks PAIRS,
    TextRank picks terms central to the corpus's co-occurrence topology).

    Pure composition of two already-oracled kernels: the map-side pair
    stream from ``cooccurrence_pairs`` (corpus text never shuffles;
    pairs with n < ``min_count`` are pruned as noise edges, self-loops
    from repeated tokens dropped), symmetrized into a directed edge list
    (both directions — undirected TextRank), then ``graph.pagerank``'s
    deterministic fixed-iteration update (decimal(38,18) contribution
    sums — bit-identical ranks cross-engine). Top-k by rank with the
    term itself as tie-break.

    Output: (term, rank), ``top_k`` rows, rank DESC.
    """
    from pangool_spark.operators.graph import pagerank

    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    pairs = cooccurrence_pairs(
        df, id_col=id_col, text_col=text_col, window=window,
        min_count=min_count,
    ).filter(F.col("term_a") != F.col("term_b"))
    edges = pairs.select(
        F.col("term_a").alias("src"), F.col("term_b").alias("dst")
    ).unionByName(
        pairs.select(
            F.col("term_b").alias("src"), F.col("term_a").alias("dst")
        )
    )
    # the edge list is the bounded vocab-pair relation; checkpoint it so
    # pagerank's per-iteration joins re-derive from HERE, not from the
    # corpus — without this Catalyst inlines the pair-stream subtree
    # into every iteration and the corpus scans O(iterations·joins)
    # times (measured: 28 parquet scans for 3 iterations — the
    # t_closeness/kcore lineage lesson)
    edges = edges.localCheckpoint(eager=True)
    if not edges.take(1):
        # sparse/tiny corpora can prune every edge at min_count — "no
        # keywords" is an EMPTY relation, not pagerank's 1/0 teleport
        return df.sparkSession.createDataFrame(
            [], "term string, rank double"
        )
    ranks = pagerank(edges, iterations=iterations)
    # ranks are rounded to 12dp BEFORE the top-k order: the raw doubles
    # can differ by an ulp across engines (double→decimal(38,18)
    # contribution casts round from the shortest-string repr in Spark
    # vs the full binary in DuckDB), and an ulp at the boundary would
    # flip which term the LIMIT admits — quantized ranks make the
    # ordering and the hash both engine-stable (the grouped_moments
    # convention; magnitudes are ≤1 so 12dp is far above ulp noise)
    return (
        ranks.select(
            F.col("node").alias("term"), F.round(F.col("rank"), 12).alias("rank")
        )
        .orderBy(F.col("rank").desc(), F.col("term").asc())
        .limit(top_k)
    )


def padding_efficiency(
    df: DataFrame,
    text_col: str = "text",
    bucket_edges: "tuple[int, ...]" = (64, 128, 256, 512, 1024),
) -> DataFrame:
    """Length-bucketed batching waste report — the audit view of the
    padding problem ``pack_sequences`` solves: if documents are batched
    by length bucket and padded to the bucket edge, how many token
    slots does each bucket burn on padding? The report that sizes
    bucket edges BEFORE a 100 TB tokenization run commits to them.

    Per bucket (smallest edge ≥ the doc's whitespace-token count;
    longer docs fall into an overflow bucket padded to the bucket's own
    max length): doc count, real tokens, padded capacity, waste, and
    the fill efficiency — plus the corpus-wide efficiency repeated per
    row (the ``diff_in_diff`` self-contained-relation convention). All
    counts are exact int64 from ONE aggregate over the token-count
    projection (map-side, no explode); efficiency is a single divide.
    Empty docs count into the smallest bucket with zero tokens.

    Output: (bucket_edge, n_docs, tokens, capacity, waste, efficiency,
    overall_efficiency) — bucket_edge is the pad-to length; the
    overflow bucket reports its realized pad-to length.
    """
    if not bucket_edges or list(bucket_edges) != sorted(set(bucket_edges)):
        raise ValueError(
            f"bucket_edges must be strictly increasing, got {bucket_edges}"
        )
    toks = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    ).cast("bigint")
    edge = F.lit(None).cast("bigint")
    for e in sorted(bucket_edges, reverse=True):
        edge = F.when(toks <= e, F.lit(int(e)).cast("bigint")).otherwise(edge)
    rows = df.select(
        toks.alias("__len__"),
        F.coalesce(edge, F.lit(None)).alias("__edge__"),  # NULL = overflow
    )
    per = rows.groupBy("__edge__").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__len__").alias("tokens"),
        F.max("__len__").alias("__maxlen__"),
    )
    pad_to = F.coalesce(F.col("__edge__"), F.col("__maxlen__"))
    per = per.select(
        pad_to.alias("bucket_edge"),
        "n_docs",
        "tokens",
        (F.col("n_docs") * pad_to).alias("capacity"),
    )
    w = Window.partitionBy()  # ≤|edges|+1 rows
    return per.select(
        "bucket_edge",
        "n_docs",
        "tokens",
        "capacity",
        (F.col("capacity") - F.col("tokens")).alias("waste"),
        F.when(
            F.col("capacity") > 0,
            F.col("tokens").cast("double") / F.col("capacity").cast("double"),
        ).alias("efficiency"),
        F.when(
            F.sum("capacity").over(w) > 0,
            F.sum("tokens").over(w).cast("double")
            / F.sum("capacity").over(w).cast("double"),
        ).alias("overall_efficiency"),
    )
