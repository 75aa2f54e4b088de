"""Information-theoretic profiling — mutual information, uncertainty
coefficients, WOE/IV feature scoring, per-document token entropy, and
unigram KL corpus drift, all reduced to exact integer count algebra plus
a quantized-logarithm sum so results are order-independent and
cross-engine replicable.

The 100 TB shape: every operator here is ONE partial-combined count
aggregate over the data (cells / token counts), after which the
information math runs on the SMALL count relation (|categories|,
|vocab|, or |docs| rows) — the raw rows are never touched twice and
never shuffled by value. Feature-vs-label association scans, corpus
drift checks, and per-document quality scores are exactly the
"run it over everything nightly" pipeline steps where a second data
pass is unaffordable.

Determinism contract (the module's quantized-ln trick, same family as
``stats.chi_squared_independence``'s quantized chi² sum): a sum of
per-row ``x·ln(x)`` doubles is order-dependent and engine-divergent, so
each per-cell logarithmic term is rounded to an integer number of
QUANTA (``round(term · quantum)``) and summed EXACTLY as decimal(38,0)
— order-independent within Spark and bit-replicable in any engine whose
``ln`` agrees to better than half a quantum (a 1-ulp libm difference
can flip a rounded quantum only on a knife-edge input; final outputs
are additionally rounded to 9 decimals to absorb 1-ulp ``ln(n)``
boundary terms). Per-cell terms stay exact in a double up to 2⁵³, i.e.
cell counts to ~10⁸ at the default quantum 10⁶ — beyond that the
rounding of the term itself (not the sum) degrades gracefully and
deterministically.

No reference parity: the reference (datasalt/Pangool, Java/Hadoop MR)
ships no information-theory operators; this module is part of the
training-data extension layer (SURVEY.md "extension layers").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "mutual_information",
    "feature_mi_rank",
    "woe_iv",
    "token_entropy",
    "unigram_kl",
]


def _qsum(term: Column, quantum: int) -> Column:
    """Order-independent sum of a logarithmic double term: round each
    term to integer quanta, sum exactly as decimal(38,0), cast double
    (the integer is exact, so the final cast is the same IEEE rounding
    in every engine)."""
    return (
        F.sum(F.round(term * F.lit(float(quantum))).cast("decimal(38,0)"))
        .cast("double")
    )


def _xlnx(c: Column) -> Column:
    """x·ln(x) with the 0·ln(0) := 0 convention (x is a count ≥ 0)."""
    x = c.cast("double")
    return F.when(c > 0, x * F.log(x)).otherwise(F.lit(0.0))


def mutual_information(
    df: DataFrame,
    a_col: str,
    b_col: str,
    quantum: int = 1_000_000,
) -> DataFrame:
    """Mutual information and uncertainty coefficients between two
    categorical columns, from ONE contingency aggregate.

    Entropies in nats via the count identity ``H = ln(n) − Σ c·ln(c)/n``
    so only the cell/marginal counts (exact int64) and one ``ln(n)``
    boundary term enter the result; the ``Σ c·ln(c)`` sums are
    quantized (module docstring). Rows where either column is NULL are
    dropped (association between observed values; make NULL a category
    with ``coalesce`` upstream if that is the question).

    Output (1 row): ``n, n_a, n_b, h_a, h_b, h_ab, mi,
    u_a_given_b, u_b_given_a`` — ``u_a_given_b = MI/H(a)`` is the
    fraction of A's uncertainty explained by B (Theil's U), NULL when
    the conditioned entropy is 0 (a constant column explains nothing
    and has nothing to explain).

    Degenerate cases are decided by EXACT counts, not float residue: a
    single-category marginal has entropy identically 0 and MI
    identically 0, so those outputs are emitted as exact zeros (and U
    as NULL/0) instead of the half-quantum quantization residue the
    raw formula would leave; non-degenerate outputs clamp at 0 before
    rounding (true MI/entropy is never negative — only residue is).

    Scale: the data is touched once (partial-combined cell counts);
    marginals and entropies derive from the |A|·|B|-row cell relation.
    The three scalar joins are broadcast 1-row cross joins.
    """
    cells = (
        df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .groupBy(F.col(a_col).alias("__a__"), F.col(b_col).alias("__b__"))
        .agg(F.count(F.lit(1)).alias("__o__"))
    )
    sab = cells.agg(
        F.sum("__o__").alias("__n__"),
        F.count(F.lit(1)).alias("n_cells"),
        _qsum(_xlnx(F.col("__o__")), quantum).alias("__sab__"),
    )
    sa = (
        cells.groupBy("__a__")
        .agg(F.sum("__o__").alias("__ra__"))
        .agg(
            F.count(F.lit(1)).alias("n_a"),
            _qsum(_xlnx(F.col("__ra__")), quantum).alias("__sa__"),
        )
    )
    sb = (
        cells.groupBy("__b__")
        .agg(F.sum("__o__").alias("__cb__"))
        .agg(
            F.count(F.lit(1)).alias("n_b"),
            _qsum(_xlnx(F.col("__cb__")), quantum).alias("__sb__"),
        )
    )
    joined = sab.crossJoin(F.broadcast(sa)).crossJoin(F.broadcast(sb))
    n = F.col("__n__").cast("double")
    q = F.lit(float(quantum))
    h_a = F.log(n) - F.col("__sa__") / (q * n)
    h_b = F.log(n) - F.col("__sb__") / (q * n)
    h_ab = F.log(n) - F.col("__sab__") / (q * n)
    mi = F.log(n) + (F.col("__sab__") - F.col("__sa__") - F.col("__sb__")) / (
        q * n
    )
    a1 = F.col("n_a") == 1
    b1 = F.col("n_b") == 1
    cells1 = F.col("n_cells") == 1

    def _z(raw: Column, degenerate: Column) -> Column:
        # exact-count degenerate → exact 0; else clamp residue, round
        return F.when(degenerate, F.lit(0.0)).otherwise(
            F.round(F.greatest(raw, F.lit(0.0)), 9)
        )

    return joined.select(
        F.col("__n__").alias("n"),
        F.col("n_a"),
        F.col("n_b"),
        _z(h_a, a1).alias("h_a"),
        _z(h_b, b1).alias("h_b"),
        _z(h_ab, cells1).alias("h_ab"),
        _z(mi, a1 | b1).alias("mi"),
        F.when(a1, F.lit(None).cast("double"))
        .when(b1, F.lit(0.0))
        .otherwise(F.round(F.greatest(mi / h_a, F.lit(0.0)), 9))
        .alias("u_a_given_b"),
        F.when(b1, F.lit(None).cast("double"))
        .when(a1, F.lit(0.0))
        .otherwise(F.round(F.greatest(mi / h_b, F.lit(0.0)), 9))
        .alias("u_b_given_a"),
    )


def feature_mi_rank(
    df: DataFrame,
    features: "Sequence[tuple[str, Column]]",
    label: Column,
    quantum: int = 1_000_000,
) -> DataFrame:
    """Feature-selection sweep: mutual information of each candidate
    feature expression against a label expression, one output row per
    feature ranked by MI (descending, name tie-break).

    ``features`` is ``[(name, expr), ...]``; each feature is scored by
    ``mutual_information`` on its own single-pass contingency aggregate
    (k features → k cell aggregates over the data — still k·O(scan)
    map-side-combined passes, not a shuffle of the rows by value; for a
    one-scan variant restrict to low-cardinality features and pivot).

    Output: ``feature, n, mi, u_label`` where ``u_label = MI/H(label)``
    — the fraction of label uncertainty the feature removes, the
    quantity a feature ranking actually wants (MI alone favors
    high-cardinality features; pair with ``u_label`` to see saturation).
    """
    parts = []
    for name, expr in features:
        scored = mutual_information(
            df.select(expr.alias("__f__"), label.alias("__l__")),
            "__f__",
            "__l__",
            quantum=quantum,
        )
        parts.append(
            scored.select(
                F.lit(name).alias("feature"),
                F.col("n"),
                F.col("mi"),
                F.col("u_b_given_a").alias("u_label"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy(F.desc("mi"), F.asc("feature"))


def woe_iv(
    df: DataFrame,
    feature_col: str,
    label: Column,
    smooth: float = 0.5,
    quantum: int = 1_000_000_000,
) -> DataFrame:
    """Weight of Evidence + Information Value of a categorical feature
    against a binary label — the standard credit-scoring / feature-audit
    encoding, as one partial-combined aggregate.

    Per category i with ``g_i`` positives and ``b_i`` negatives out of
    totals G and B over k categories, with add-``smooth`` smoothing so
    one-sided categories stay finite::

        pg_i  = (g_i + s) / (G + k·s)
        pb_i  = (b_i + s) / (B + k·s)
        woe_i = ln(pg_i / pb_i)
        iv    = Σ_i (pg_i − pb_i) · woe_i

    ``label`` must evaluate to a boolean (NULL label rows are dropped;
    NULL feature values form their own category — missingness is
    usually the most predictive bin). The IV total accumulates as a
    quantized sum over the k-row category relation (module docstring)
    so it is order-independent; per-row WOE/IV terms round to 9
    decimals. Totals come from a window over the k-row CATEGORY
    relation — one data scan total; the single-partition window only
    ever holds k rows.

    Output (k rows): ``feature_value, goods, bads, woe, iv_term,
    iv_total`` (``iv_total`` repeated on every row so the relation is
    self-contained). Rule of thumb: IV < 0.02 useless, > 0.5 suspect.
    """
    if smooth <= 0:
        raise ValueError(f"smooth must be positive, got {smooth}")
    lbl = label.cast("boolean")
    cells = (
        df.filter(lbl.isNotNull())
        .groupBy(F.col(feature_col).alias("feature_value"))
        .agg(
            F.count(F.when(lbl, 1)).alias("goods"),
            F.count(F.when(~lbl, 1)).alias("bads"),
        )
    )
    # totals via a window over the CELL relation: the input is k rows
    # (one per category), so the single partition holds k rows, never
    # the data — and the raw rows are scanned exactly once. (A
    # broadcast-aggregate form avoids the window but replays the
    # contingency aggregate per consumer: 3 data scans. Scans dominate
    # at 100 TB; the k-row window does not.)
    w = Window.partitionBy()
    s = F.lit(float(smooth))
    k = F.count(F.lit(1)).over(w).cast("double")
    big_g = F.sum("goods").over(w).cast("double")
    big_b = F.sum("bads").over(w).cast("double")
    pg = (F.col("goods").cast("double") + s) / (big_g + k * s)
    pb = (F.col("bads").cast("double") + s) / (big_b + k * s)
    woe = F.log(pg / pb)
    iv_term = (pg - pb) * woe
    q = F.lit(float(quantum))
    iv_total = (
        F.sum(F.round(iv_term * q).cast("decimal(38,0)")).over(w).cast("double")
        / q
    )
    return cells.select(
        "feature_value",
        "goods",
        "bads",
        F.round(woe, 9).alias("woe"),
        F.round(iv_term, 9).alias("iv_term"),
        iv_total.alias("iv_total"),
    )


def token_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quantum: int = 1_000_000,
) -> DataFrame:
    """Per-document lexical-diversity profile: token count, type count,
    type-token ratio, Shannon entropy of the unigram distribution
    (nats), and entropy normalized by its ``ln(types)`` maximum.

    The text-quality signal LSH/minhash dedup does not give you: a doc
    whose 5k tokens are 40 types (template spam, keyword stuffing,
    boilerplate repetition) scores near-zero normalized entropy and is
    a drop candidate before any pairwise dedup runs. Tokenization is
    the engine's standard whitespace split on lowercased text (the
    ``wordcount`` contract).

    One explode + one (doc, token) count aggregate + one per-doc
    aggregate — all partial-combined, data touched once, never
    collected. Entropy uses the quantized ``Σ c·ln(c)`` sum (module
    docstring). Empty/whitespace-only docs emit no row (they have no
    token distribution); single-type docs get ``norm_entropy`` NULL
    (0/0 — no diversity is measurable on one type).

    Output: ``(id_col, n_tokens, n_types, ttr, entropy, norm_entropy)``.
    """
    toks = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
                "__tok__"
            ),
        )
        .filter(F.col("__tok__") != "")
    )
    counts = toks.groupBy(id_col, "__tok__").agg(
        F.count(F.lit(1)).alias("__c__")
    )
    per_doc = counts.groupBy(id_col).agg(
        F.sum("__c__").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        _qsum(_xlnx(F.col("__c__")), quantum).alias("__s__"),
    )
    n = F.col("n_tokens").cast("double")
    q = F.lit(float(quantum))
    ent = F.log(n) - F.col("__s__") / (q * n)
    # single-type docs have entropy IDENTICALLY 0 — decide by the exact
    # type count, not the half-quantum residue the raw formula leaves
    one_type = F.col("n_types") == 1
    return per_doc.select(
        id_col,
        "n_tokens",
        "n_types",
        F.round(F.col("n_types").cast("double") / n, 9).alias("ttr"),
        F.when(one_type, F.lit(0.0))
        .otherwise(F.round(F.greatest(ent, F.lit(0.0)), 9))
        .alias("entropy"),
        F.when(
            ~one_type,
            F.round(
                F.greatest(
                    ent / F.log(F.col("n_types").cast("double")), F.lit(0.0)
                ),
                9,
            ),
        ).alias("norm_entropy"),
    )


def unigram_kl(
    docs_p: DataFrame,
    docs_q: DataFrame,
    text_col: str = "text",
    quantum: int = 1_000_000_000,
) -> DataFrame:
    """Unigram-distribution drift between two corpora: KL divergence in
    both directions with add-1 smoothing over the JOINT vocabulary —
    "has the token distribution of this week's crawl moved away from
    the reference mix", the lexical sibling of
    ``stats.embedding_drift`` / ``histogram TV drift``.

    With joint vocabulary size V and total token counts n_p, n_q::

        p_i = (c_p,i + 1) / (n_p + V)      (likewise q_i)
        KL(P‖Q) = Σ_i p_i · ln(p_i / q_i)

    The probability ratio is computed as an exact-integer cross ratio
    ``((c_p,i+1)·(n_q+V)) / ((c_q,i+1)·(n_p+V))`` before the single
    ``ln`` per term, and per-term contributions are quantized-summed
    (module docstring) — order-independent, cross-engine stable.
    Tokenization is the ``wordcount`` contract (lowercase whitespace
    split). Identical corpora give exactly 0.0 in both directions.

    One count aggregate per corpus + one full outer join ON TOKEN
    (|vocab| rows, not |tokens|) + one scalar reduce. Integer products
    stay double-exact while ``(max count+1)·(n+V) < 2⁵³``.

    Output (1 row): ``vocab, n_p, n_q, kl_pq, kl_qp``.
    """

    def _counts(d: DataFrame, alias: str) -> DataFrame:
        return (
            d.select(
                F.explode(
                    F.split(F.lower(F.col(text_col)), r"\s+")
                ).alias("__tok__")
            )
            .filter(F.col("__tok__") != "")
            .groupBy("__tok__")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    cp = _counts(docs_p, "__cp__")
    cq = _counts(docs_q, "__cq__")
    vocab = cp.join(cq, "__tok__", "full_outer").select(
        F.coalesce("__cp__", F.lit(0)).alias("__cp__"),
        F.coalesce("__cq__", F.lit(0)).alias("__cq__"),
    )
    totals = F.broadcast(
        vocab.agg(
            F.count(F.lit(1)).alias("vocab"),
            F.sum("__cp__").alias("n_p"),
            F.sum("__cq__").alias("n_q"),
        )
    )
    joined = vocab.crossJoin(totals)
    dp = (F.col("n_p") + F.col("vocab")).cast("double")
    dq = (F.col("n_q") + F.col("vocab")).cast("double")
    ap = (F.col("__cp__") + F.lit(1)).cast("double")
    aq = (F.col("__cq__") + F.lit(1)).cast("double")
    lnratio = F.log((ap * dq) / (aq * dp))
    q = F.lit(float(quantum))
    return (
        joined.groupBy("vocab", "n_p", "n_q")
        .agg(
            _qsum((ap / dp) * lnratio, quantum).alias("__skl_pq__"),
            _qsum((aq / dq) * (-lnratio), quantum).alias("__skl_qp__"),
        )
        .select(
            "vocab",
            "n_p",
            "n_q",
            (F.col("__skl_pq__") / q).alias("kl_pq"),
            (F.col("__skl_qp__") / q).alias("kl_qp"),
        )
    )
