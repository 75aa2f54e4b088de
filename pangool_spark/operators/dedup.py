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


def shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Normalization: lowercase, collapse whitespace. Documents with fewer than
    ``n`` words yield their whole token string as one shingle so they still
    participate.
    """
    tokens = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "),
        lambda t: t != "",
    )
    n_tokens = F.size(tokens)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n_tokens - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
    )
    return (
        df.select(F.col(id_col), F.explode(grams).alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", keep: str = "min"
) -> DataFrame:
    """Exact duplicate removal on normalized content digest.

    Hash-groupBy on md5(normalized text): one shuffle of (digest, id), the
    representative is the min (or max) id. Returns the surviving rows of
    ``df``.
    """
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    digest = F.md5(normalized).alias("__digest__")
    keep_fn = F.min if keep == "min" else F.max
    reps = (
        df.select(digest, F.col(id_col))
        .groupBy("__digest__")
        .agg(keep_fn(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(reps, on=id_col, how="left_semi")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All near-duplicate pairs by word-n-gram Jaccard similarity ≥ threshold.

    Inverted-index join: explode distinct shingles, self-join on shingle to
    count intersections, then |A∩B| / (|A|+|B|-|A∩B|). The shingle join is an
    equi-join Catalyst can shuffle-hash; a length filter prunes pairs whose
    size ratio already caps Jaccard below the threshold (standard prefix
    filter — drops the quadratic tail at scale).

    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = shingles(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
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


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """MinHash signature per document: array<long> of length ``num_hashes``.

    Each permutation h_i(s) = xxhash64(shingle, seed=i); the signature element
    is min over the doc's shingles — computed as a single groupBy with
    ``num_hashes`` min() aggregates (one shuffle, map-side partials).
    """
    sh = shingles(df, id_col, text_col, n)
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}") for i in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col), F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash + LSH banding, verified by
    signature-estimated Jaccard ≥ threshold.

    shingle → minhash → band (rows = num_hashes/bands) → bucket equi-join on
    (band_idx, band_hash) → estimate jaccard as matching-signature-position
    fraction. Only bucket-colliding pairs are compared: the candidate set is
    linear-ish in practice, never O(n²).

    Output: (id_a, id_b, est_jaccard).
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes).cache()
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


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per document over word features.

    Per token t: h = xxhash64(t); bit b contributes +1 if set else -1; the
    fingerprint sets bit b where the sum > 0. Expressed as explode + one
    groupBy with per-bit sums (native aggregates, map-side combine).
    """
    if bits != 64:
        raise ValueError("only 64-bit simhash supported")
    tokens = (
        df.select(
            F.col(id_col),
            F.explode(
                F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
            ).alias("token"),
        )
        .withColumn("h", F.xxhash64("token"))
    )
    def bitmask(b: int) -> int:
        # bit 63 of a signed 64-bit long is the sign bit: 1<<63 overflows
        # LongType, so use its two's-complement value.
        return (1 << b) if b < 63 else -(1 << 63)

    bit_sums = tokens.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(bitmask(b))) != 0, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(bitmask(b))).otherwise(F.lit(0))
        fp = term if fp is None else fp.bitwiseOR(term)
    return bit_sums.select(F.col(id_col), fp.cast("long").alias("simhash"))


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
    fp = simhash(df, id_col, text_col).cache()
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


def embedding_cosine_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold, via brute-force pair
    join on normalized vectors. For the scale path use
    ``similarity.lsh_cosine_pairs`` (random-hyperplane buckets).
    """
    from pangool_spark.operators.similarity import _dot_udf, _normalized

    v = _normalized(emb, id_col, vec_col)
    a = v.select(F.col(id_col).alias("id_a"), F.col("__norm_vec__").alias("va"))
    b = v.select(F.col(id_col).alias("id_b"), F.col("__norm_vec__").alias("vb"))
    dot = _dot_udf()
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot("va", "vb").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
