"""Approximate string joins: all pairs within a Levenshtein edit-distance
bound, without the O(n²) cross join.

Record-linkage / near-key matching (product names, addresses, OCR noise) —
the join MapReduce shops implemented as a q-gram inverted index
(Gravano et al., "Approximate String Joins in a Database (Almost) for
Free", VLDB 2001). Spark-first restatement:

- **q-gram blocking (long strings)**: if ed(a, b) ≤ d then a and b share
  at least max(|a|,|b|) − q + 1 − q·d q-grams; for strings of length
  ≥ q·(d+1) that bound is ≥ 1, so candidates are exactly the pairs
  sharing at least one character q-gram — an equi-join on the gram, the
  same inverted-index shape as the n-gram Jaccard dedup.
- **length-band blocking (short strings)**: below q·(d+1) characters the
  lemma's bound can reach 0 (two strings within distance d may share no
  gram at all), so the short slice joins against everything within ±d of
  its length instead — an equi-join on an exploded length band (2d+1
  keys per short string). Short strings are by definition a bounded
  slice of the corpus.
- **verify**: surviving candidates run the built-in JVM ``levenshtein``
  (no Python in the row path). Both stages pre-filter on
  ``|len(a) − len(b)| ≤ d`` (a length gap beyond d already implies
  ed > d).

The union of both candidate sets is EXACT — no true pair can be pruned —
so results are value-oracle-checkable against a naive cross join.

Scale notes: the gram join shuffles (id, 8-byte xxhash64(gram)) rows,
never the strings; stop-grams (a gram occurring in a large fraction of
the corpus, like "Customer#" prefixes) quadratically inflate CANDIDATES,
the classic failure mode of q-gram blocking — diverse natural-language
strings are the intended domain, ID-like strings with long shared
prefixes are not (their pairs all collide into the same grams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def edit_distance_pairs(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    max_d: int = 1,
    q: int = 3,
    strategy: str = "auto",
) -> DataFrame:
    """All pairs (id_a < id_b) with Levenshtein distance ≤ ``max_d``.

    Output: (id_a, id_b, distance). Exact (both blocking strategies are
    lossless — see module docstring); ``q``/``strategy`` trade index size
    against candidate selectivity and never affect results.

    ``strategy``:

    - ``'deletion'`` — symmetric-deletion blocking (FastSS / SymSpell):
      index each string under the xxhash64 of itself and of every
      single-character deletion; any pair within ed ≤ 1 must share a
      variant (equal → identity; substitution → delete the edited
      position on both sides; insert/delete → one side's deletion equals
      the other's identity). O(len) 8-byte index rows per string, and
      bucket keys encode nearly the whole string, so candidates collapse
      to true-ish pairs even on corpora whose q-gram vocabulary is
      degenerate (TPC-H part names have ~167 distinct 3-grams at 200k
      rows — every gram is a stop-gram and the gram join output is
      ~47 BILLION rows; the deletion index runs the same query in
      seconds). d ≤ 1 only.
    - ``'gram'`` — the Gravano q-gram inverted index + count filter +
      length band (any ``max_d``; the diverse-vocabulary path).
    - ``'auto'`` — ``'deletion'`` when ``max_d <= 1``, else ``'gram'``.
    """
    if max_d < 0:
        raise ValueError(f"max_d must be >= 0, got {max_d}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    if strategy not in ("auto", "gram", "deletion"):
        raise ValueError(f"unknown strategy {strategy!r}: auto|gram|deletion")
    if strategy == "auto":
        strategy = "deletion" if max_d <= 1 else "gram"
    if strategy == "deletion" and max_d > 1:
        raise ValueError("strategy='deletion' supports max_d <= 1 only")
    s = df.select(
        F.col(id_col).alias("__id__"),
        F.col(text_col).alias("__s__"),
        F.length(text_col).alias("__l__"),
    ).filter(F.col("__s__").isNotNull())

    if strategy == "deletion":
        variants = s.select(
            "__id__",
            "__l__",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(0, length(__s__)), i -> "
                        "xxhash64(if(i = 0, __s__, "
                        "concat(substring(__s__, 1, i-1), "
                        "substring(__s__, i+1)))))"
                    )
                    if max_d >= 1
                    else F.expr("array(xxhash64(__s__))")
                )
            ).alias("__v__"),
        )
        va = variants.select(
            F.col("__id__").alias("id_a"), F.col("__l__").alias("__la__"), "__v__"
        )
        vb = variants.select(
            F.col("__id__").alias("id_b"), F.col("__l__").alias("__lb__"), "__v__"
        )
        candidates = (
            va.join(vb, "__v__")
            .filter(
                (F.col("id_a") < F.col("id_b"))
                & (F.abs(F.col("__la__") - F.col("__lb__")) <= max_d)
            )
            .select("id_a", "id_b")
            .distinct()
        )
        sa = s.select(F.col("__id__").alias("id_a"), F.col("__s__").alias("__sa__"))
        sb = s.select(F.col("__id__").alias("id_b"), F.col("__s__").alias("__sb__"))
        return (
            candidates.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn("distance", F.levenshtein("__sa__", "__sb__"))
            .filter(F.col("distance") <= max_d)
            .select("id_a", "id_b", "distance")
        )
    short_bound = q * (max_d + 1)
    longs = s.filter(F.col("__l__") >= short_bound)
    shorts = s.filter(F.col("__l__") < short_bound)

    # long×long: q-gram blocking (hashed to 8-byte join keys), keeping
    # per-(id, gram) MULTIPLICITY — one row per distinct gram with its
    # count, so repeated grams don't blow up the join cardinality but
    # the count filter still sees the multiset.
    grams = (
        longs.select(
            "__id__",
            "__l__",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(__s__) - {q} + 1),"
                    f" i -> substring(__s__, i, {q}))"
                )
            ).alias("__g__"),
        )
        .select("__id__", "__l__", F.xxhash64("__g__").alias("__g__"))
        .groupBy("__id__", "__l__", "__g__")
        .agg(F.count(F.lit(1)).alias("__c__"))
    )
    ga = grams.select(
        F.col("__id__").alias("id_a"),
        F.col("__l__").alias("__la__"),
        "__g__",
        F.col("__c__").alias("__ca__"),
    )
    gb = grams.select(
        F.col("__id__").alias("id_b"),
        F.col("__l__").alias("__lb__"),
        "__g__",
        F.col("__c__").alias("__cb__"),
    )
    # Gravano's COUNT filter, not just ≥1 shared gram: ed(a,b) ≤ d forces
    # at least max(|a|,|b|) − q + 1 − q·d positionally-shared q-grams
    # (≥ 1 on the long slice by construction, so this strictly subsumes
    # the ≥1 test). Shared grams are counted as Σ_g cnt_a(g)·cnt_b(g) ≥
    # Σ_g min(cnt_a, cnt_b) = bag intersection ≥ positional overlap ≥
    # the Gravano bound, so the filter stays LOSSLESS even for strings
    # with repeated grams ('aaaaaaaa' vs 'aaabaaaa' survives — r07 advice:
    # counting DISTINCT shared grams undercounts the multiset and wrongly
    # pruned exactly those pairs). The groupBy replaces the old
    # distinct() — same dedup shuffle, far fewer survivors: pairs sharing
    # a long common substring but differing beyond d (same-length catalog
    # variants, versioned names) are exactly the candidates it kills.
    # Measured at 10× bench scale: 232s → dominated-by-verify down to
    # seconds-range candidates (see ROADMAP round-7 notes).
    min_shared = F.greatest(F.col("__la__"), F.col("__lb__")) - F.lit(
        q - 1 + q * max_d
    )
    cand_long = (
        ga.join(gb, "__g__")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("__la__") - F.col("__lb__")) <= max_d)
        )
        .groupBy("id_a", "id_b", "__la__", "__lb__")
        .agg(F.sum(F.col("__ca__") * F.col("__cb__")).alias("__shared__"))
        .filter(F.col("__shared__") >= min_shared)
        .select("id_a", "id_b")
    )

    # short×anything: length-band equi-join (2·max_d+1 keys per short row)
    banded = shorts.select(
        F.col("__id__").alias("__sid__"),
        F.explode(
            F.sequence(
                F.greatest(F.col("__l__") - max_d, F.lit(0)),
                F.col("__l__") + max_d,
            )
        ).alias("__l__"),
    )
    cand_short = (
        banded.join(s.select(F.col("__id__").alias("__oid__"), "__l__"), "__l__")
        .filter(F.col("__sid__") != F.col("__oid__"))
        .select(
            F.least("__sid__", "__oid__").alias("id_a"),
            F.greatest("__sid__", "__oid__").alias("id_b"),
        )
        .distinct()
    )

    candidates = cand_long.unionByName(cand_short).distinct()
    sa = s.select(F.col("__id__").alias("id_a"), F.col("__s__").alias("__sa__"))
    sb = s.select(F.col("__id__").alias("id_b"), F.col("__s__").alias("__sb__"))
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("distance", F.levenshtein("__sa__", "__sb__"))
        .filter(F.col("distance") <= max_d)
        .select("id_a", "id_b", "distance")
    )


def edit_distance_join(
    a: DataFrame,
    b: DataFrame,
    id_a: str,
    text_a: str,
    id_b: str,
    text_b: str,
    max_d: int = 1,
    q: int = 3,
    strategy: str = "auto",
) -> DataFrame:
    """Cross-relation form of ``edit_distance_pairs`` (match a new batch
    of names against a standing reference): pairs (id_a, id_b, distance ≤
    ``max_d``) between two relations. Id spaces need not be disjoint —
    sides are tracked structurally. Same lossless blocking strategies."""
    ta = a.select(F.col(id_a).alias("__id__"), F.col(text_a).alias("__s__"))
    tb = b.select(F.col(id_b).alias("__id__"), F.col(text_b).alias("__s__"))
    tagged = ta.withColumn("__side__", F.lit(0)).unionByName(
        tb.withColumn("__side__", F.lit(1))
    )
    # composite surrogate key keeps sides distinct even on id collisions
    keyed = tagged.select(
        F.struct("__side__", "__id__").alias("k"), F.col("__s__").alias("t")
    )
    pairs = edit_distance_pairs(keyed, "k", "t", max_d, q, strategy)
    cross = pairs.filter(F.col("id_a.__side__") != F.col("id_b.__side__"))
    a_key = F.when(F.col("id_a.__side__") == 0, F.col("id_a.__id__")).otherwise(
        F.col("id_b.__id__")
    )
    b_key = F.when(F.col("id_a.__side__") == 1, F.col("id_a.__id__")).otherwise(
        F.col("id_b.__id__")
    )
    return cross.select(
        a_key.alias("id_a"), b_key.alias("id_b"), "distance"
    )


def best_match_join(
    a: DataFrame,
    b: DataFrame,
    id_a: str,
    text_a: str,
    id_b: str,
    text_b: str,
    max_d: int = 1,
    q: int = 3,
    strategy: str = "auto",
) -> DataFrame:
    """Record-linkage RESOLUTION: each left row's single best reference
    match — minimum edit distance within ``max_d``, ties broken by the
    lowest reference id (deterministic). The step after candidate
    generation every entity-resolution pipeline ends with: one row per
    matched left entity, unmatched entities absent (report them with an
    anti-join on id_a; absence ≠ failure).

    Rides ``edit_distance_join``'s lossless blocking, then a rank-1
    window Spark executes as WindowGroupLimit (per-partition top-1 below
    the shuffle — the candidate set never materializes per group).

    Output: (id_a, id_b, distance).
    """
    cands = edit_distance_join(
        a, b, id_a, text_a, id_b, text_b, max_d=max_d, q=q, strategy=strategy
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("distance").asc(), F.col("id_b").asc()
    )
    return (
        cands.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select("id_a", "id_b", "distance")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 10,
    max_distance: int = 1,
) -> DataFrame:
    """Sorted-Neighborhood Method (SNM) blocking for entity resolution
    (Hernández & Stolfo, SIGMOD'95): sort on the blocking key, slide a
    ``window``-row pane, and verify only in-pane pairs — the classic
    alternative to q-gram/deletion blocking (``fuzzy_join``) that finds
    matches q-gram blocking structurally misses (prefix typos shift
    every q-gram, but barely move the sort position — and vice versa;
    production ER runs BOTH and unions candidates).

    Scale shape: the global sort rank comes from ``stable_row_ids``
    (sample-sort — never a single-partition window); in-pane candidate
    pairs come from a BLOCK equi-join (block = rank div window; a pair
    within ``window`` ranks spans at most two adjacent blocks, so each
    row probes its own and its predecessor block — pigeonhole-complete,
    no n² and no w-way explode). Verification is one native
    levenshtein per candidate. Candidates are exactly n·w pairs, the
    SNM contract.

    Output: (id_a, id_b, key_a, key_b, distance) with id_a < id_b,
    distance ≤ max_distance.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    from pangool_spark.operators.partitioning import stable_row_ids

    ranked = stable_row_ids(
        df.select(F.col(id_col), F.col(key_col)),
        [key_col, id_col],
        id_col="__rank__",
    ).select(
        F.col(id_col).alias("__id__"),
        F.col(key_col).alias("__key__"),
        "__rank__",
        ((F.col("__rank__") - 1) / window).cast("bigint").alias("__blk__"),
    )
    probe = ranked.select(
        F.col("__id__").alias("__idb__"),
        F.col("__key__").alias("__keyb__"),
        F.col("__rank__").alias("__rankb__"),
        F.explode(
            F.array(F.col("__blk__"), F.col("__blk__") - 1)
        ).alias("__blk__"),
    )
    cand = ranked.join(probe, "__blk__").filter(
        (F.col("__rankb__") - F.col("__rank__") >= 1)
        & (F.col("__rankb__") - F.col("__rank__") <= window)
    )
    return (
        cand.withColumn(
            "distance", F.levenshtein(F.col("__key__"), F.col("__keyb__"))
        )
        .filter(F.col("distance") <= max_distance)
        .select(
            F.least("__id__", "__idb__").alias("id_a"),
            F.greatest("__id__", "__idb__").alias("id_b"),
            F.when(F.col("__id__") < F.col("__idb__"), F.col("__key__"))
            .otherwise(F.col("__keyb__"))
            .alias("key_a"),
            F.when(F.col("__id__") < F.col("__idb__"), F.col("__keyb__"))
            .otherwise(F.col("__key__"))
            .alias("key_b"),
            "distance",
        )
        .distinct()
    )
