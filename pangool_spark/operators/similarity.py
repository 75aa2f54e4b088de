"""Similarity search over embedding columns (``array<float>``).

Extension over the reference (SURVEY §7.0 layer 3). Two paths:

- ``knn_bruteforce``: exact top-k cosine neighbors for a (small) query set —
  broadcast the queries, one pass over the corpus, per-partition heap via
  window top-k. The corpus is never shuffled full-width: only (query, id,
  score) triples move.
- ``lsh_cosine_pairs`` / ``ivf_assign``: the scale paths. Random-hyperplane
  LSH buckets candidates for pairwise search; IVF assigns vectors to
  centroids so queries probe only a few cells.

Dot products use ``F.zip_with`` + ``F.aggregate`` — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Row-slab size for blocked matmuls in applyInPandas kernels: bounds the
# similarity panel to _MATMUL_CHUNK × group_rows float64 (~64 MB at the
# blocked_cosine_pairs defaults) instead of group_rows².
_MATMUL_CHUNK = 1024


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot_udf():
    """Vectorized (Arrow/numpy) dot product over two array columns.

    Spark's higher-order-function fold is interpreted per element — fine for
    a handful of rows, ~100× too slow for pair joins. The pandas UDF moves
    whole Arrow batches into numpy and does one einsum per batch.
    """
    from pangool_spark.operators._udfs import dot_udf

    return dot_udf


def _norm(v) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _normalized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Project to (id, __norm_vec__): unit-length double vector."""
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.select(
        F.col(id_col),
        F.transform(dv, lambda x: x / F.greatest(_norm(dv), F.lit(1e-12))).alias("__norm_vec__"),
    )


def cosine_similarity(df: DataFrame, a_col: str, b_col: str, out_col: str = "cosine") -> DataFrame:
    """Row-wise cosine between two vector columns."""
    a = F.transform(F.col(a_col), lambda x: x.cast("double"))
    b = F.transform(F.col(b_col), lambda x: x.cast("double"))
    denom = F.greatest(_norm(a) * _norm(b), F.lit(1e-12))
    return df.withColumn(out_col, _dot(a, b) / denom)


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self-matches by id).

    Broadcast the (small) query set against the corpus — the corpus-side scan
    is embarrassingly parallel, and the final top-k per query is a window
    rank Spark executes with a per-partition heap below the shuffle.

    Output: (query_id, neighbor_id, rank) — rank 1..k by cosine DESC,
    neighbor id ASC tie-break (deterministic).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    qid = query_id_col or id_col
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("vc"))
    q_local = queries.select(F.col(qid), F.col(vec_col)).collect()
    if not q_local:
        spark = corpus.sparkSession
        return spark.createDataFrame(
            [], "query_id LONG, neighbor_id LONG, rank INT"
        )
    q_ids = np.array([r[0] for r in q_local], dtype=np.int64)
    q_mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_local])
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )

    def score_partition(batches):
        ids, mat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_mat = np.stack(pdf["vc"].to_numpy()).astype(np.float64)
            c_mat /= np.maximum(np.linalg.norm(c_mat, axis=1, keepdims=True), 1e-12)
            # (corpus_batch × dim) @ (dim × n_queries) — one BLAS call
            scores = c_mat @ mat.T
            # per-query partial top-k within this batch bounds shuffle width
            kk = min(k + 1, len(c_ids))
            top = np.argpartition(-scores, kk - 1, axis=0)[:kk]
            rows = {"query_id": [], "neighbor_id": [], "cosine": []}
            for j in range(len(ids)):
                for i in top[:, j]:
                    if c_ids[i] != ids[j]:
                        rows["query_id"].append(ids[j])
                        rows["neighbor_id"].append(c_ids[i])
                        rows["cosine"].append(scores[i, j])
            yield pd.DataFrame(rows)

    partial = c.mapInPandas(score_partition, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python, driver-side)."""
    import math
    import random

    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / n for x in v])
    return planes


def lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane (sign) LSH bucket id per vector.

    bucket = Σ (dot(v, plane_i) > 0) << i — vectors with high cosine land in
    the same bucket with high probability. The planes are literals folded
    into the plan (broadcast-free).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = F.lit(0)
    for i, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        p = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(_dot(v, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn(out_col, bucket)


def auto_lsh_params(threshold: float, target_miss: float = 1e-5) -> tuple[int, int]:
    """Derive sign-LSH (n_planes, n_tables) from the hyperplane collision
    model so recall is controlled instead of guessed.

    For two vectors at cosine t the per-plane agreement probability is
    p = 1 - arccos(t)/π; a pair at exactly the threshold collides in one
    table with p**n_planes, so the per-pair miss probability over T
    independent tables is (1 - p**n_planes)**T. We pick n_planes by
    threshold tier (more planes = smaller buckets but weaker per-table
    recall) and solve T for the target miss.

    Honest scale note: sign-LSH's exponent is ρ = ln(p1)/ln(p2); at low
    thresholds (≈0.4, p1≈0.63 vs random p2=0.5) ρ≈0.66, so candidate volume
    approaches all-pairs and only the constant factors improve. LSH earns
    its keep at the production near-dup regime (ρ ≈ 0.33 at t=0.8,
    ρ ≈ 0.22 at t=0.9).
    """
    import math

    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    p = 1.0 - math.acos(threshold) / math.pi
    n_planes = 12 if threshold >= 0.9 else 8 if threshold >= 0.8 else 4 if threshold >= 0.6 else 2
    p_table = p**n_planes
    n_tables = max(1, math.ceil(math.log(target_miss) / math.log(1.0 - p_table)))
    return n_planes, n_tables


def lsh_cosine_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    verify: str = "auto",
    n_rows: int | None = None,
) -> DataFrame:
    """Approximate all-pairs cosine ≥ threshold via multi-table sign-LSH.

    Candidates = pairs sharing a bucket in ANY of ``n_tables`` independent
    tables, then exact cosine verify. One numpy pass computes every table's
    bucket (a single (rows × dim) @ (dim × tables·planes) matmul), one
    equi-join on (table, bucket) generates candidates — scales as Σ bucket²
    instead of n², and the plan has one exchange regardless of n_tables.

    ``verify``: how candidate pairs get their exact cosine.
    - ``"join"``: join candidates back to the vector relation (always
      correct; ships both arrays per pair — 2·dim·8 bytes/pair).
    - ``"broadcast"``: broadcast the whole (id → vector) matrix and look
      pairs up executor-side — only (id_a, id_b) ever moves (16 B/pair,
      ~60× less traffic at dim 64). Valid when the corpus fits a broadcast
      (same contract as ``knn_bruteforce``'s query set).
    - ``"auto"``: broadcast when ``n_rows × dim`` ≤ ~50M floats, else join.
      The corpus size comes from the ``n_rows`` hint — there is NO counting
      job (at 100 TB an accidental ``count()`` is a full scan); with no
      hint (or a non-positive one, which is treated as absent), auto falls
      back to the always-correct join path. An UNDERSTATED positive hint is
      trusted and can pick broadcast on a corpus that does not fit the
      driver — the hint is a contract, not a suggestion.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    flat = np.array(
        [p for t in range(n_tables) for p in _hyperplanes(dim, n_planes, 42 + t)]
    )  # (tables*planes, dim)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    # sign(dot) is scale-invariant: banding works on RAW vectors, no
    # normalization pass needed.
    vecs = df.select(F.col(id_col), F.col(vec_col).alias("__vec__"))
    band_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("t", T.IntegerType(), False),
            T.StructField("bucket", T.LongType(), False),
        ]
    )

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(pdf["__vec__"].to_numpy()).astype(np.float64)
            bits = (mat @ flat.T) > 0  # (n, tables*planes)
            buckets = (
                bits.reshape(len(ids), n_tables, n_planes) * weights
            ).sum(axis=2)  # (n, tables)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, n_tables),
                    "t": np.tile(np.arange(n_tables, dtype=np.int32), len(ids)),
                    "bucket": buckets.ravel(),
                }
            )

    banded = vecs.mapInPandas(assign, schema=band_schema)
    # Spread the join fan-out BEFORE it happens: the banded relation is tiny
    # (3 numbers/row) but each of its rows explodes into a bucket's worth of
    # pairs downstream — from a single-file source the whole
    # join→verify pipeline would otherwise run as ONE task.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    left = banded.repartition(n_parts, "t", "bucket").select(
        F.col(id_col).alias("id_a"), "t", "bucket"
    )
    right = banded.select(F.col(id_col).alias("id_b"), "t", "bucket")
    raw_candidates = (
        left.join(right, ["t", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    if verify == "auto":
        verify = (
            "broadcast"
            if n_rows is not None and n_rows > 0 and n_rows * dim <= 50_000_000
            else "join"
        )
    if verify == "broadcast":
        # NO pre-distinct: with lookup-based verify a duplicate candidate
        # costs one einsum row (cheap), while distinct() costs an exchange
        # of the full multi-table candidate stream (dominant — measured 4s
        # of a 6s query). Candidates flow join → verify in ONE stage, and
        # only the tiny verified output is deduped.
        return _verify_pairs_broadcast(vecs, raw_candidates, threshold, id_col).distinct()
    if verify != "join":
        raise ValueError(f"unknown verify mode {verify!r}")
    # join verify ships both vectors per pair: distinct() first so its
    # partial aggregate shrinks the stream map-side BEFORE the exchange.
    candidates = raw_candidates.distinct()
    from pangool_spark.operators._udfs import cosine_udf

    a = vecs.select(F.col(id_col).alias("id_a"), F.col("__vec__").alias("va"))
    b = vecs.select(F.col(id_col).alias("id_b"), F.col("__vec__").alias("vb"))
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", cosine_udf("va", "vb").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _verify_pairs_broadcast(
    vecs: DataFrame, candidates: DataFrame, threshold: float, id_col: str
) -> DataFrame:
    """Exact-cosine verify of (id_a, id_b) pairs against a BROADCAST vector
    matrix: candidates stream through mapInPandas carrying only two longs
    per row; each batch does one gather + one einsum. Bit-identical to
    ``cosine_udf`` (same float64 op order), so results match the join path
    exactly."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    rows = vecs.collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1)
    bc = vecs.sparkSession.sparkContext.broadcast((ids, mat, norms))

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType(), False),
            T.StructField("id_b", T.LongType(), False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )

    def verify_batches(batches):
        s_ids, s_mat, s_norms = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ia = np.searchsorted(s_ids, pdf["id_a"].to_numpy(dtype=np.int64))
            ib = np.searchsorted(s_ids, pdf["id_b"].to_numpy(dtype=np.int64))
            dots = np.einsum("ij,ij->i", s_mat[ia], s_mat[ib])
            cos = dots / np.maximum(s_norms[ia] * s_norms[ib], 1e-12)
            keep = cos >= threshold
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "cosine": cos[keep],
                }
            )

    return candidates.mapInPandas(verify_batches, schema=out_schema)


def blocked_cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rows_per_block: int = 4096,
    n_rows: int | None = None,
) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold via block-pair matmul.

    The scale path for LOW thresholds, where sign-LSH is provably degenerate
    (ρ → 1 as threshold → 0, see ``auto_lsh_params``): accept the inherent
    O(n²) comparison count but make every comparison a dense BLAS flop
    instead of a shuffled join row.

    Shape: assign each vector to one of ``B = ⌈n/rows_per_block⌉`` hash
    blocks, replicate it into every unordered block pair containing its
    block (B copies), and shuffle ONCE on (b1, b2). Each of the B(B+1)/2
    groups holds ~2·rows_per_block vectors and does one matmul; every
    unordered id pair lands in exactly one group, so no distinct() is
    needed. Costs:

    - shuffle: n·B rows = O(n²/rows_per_block) — at rows_per_block=4096
      that is ~1/500th of a pair-materializing join's traffic;
    - compute: O(n²·dim) flops, dense and embarrassingly parallel across
      B(B+1)/2 independent tasks;
    - memory per task: the vector matrix is ~2·rows_per_block·dim·8 bytes,
      and the matmul is evaluated in ``_MATMUL_CHUNK``-row slabs so the
      similarity panel peaks at ~_MATMUL_CHUNK·2·rows_per_block·8 bytes
      (~64 MB at the defaults) instead of a full
      (2·rows_per_block)² float64 matrix (~540 MB) — several concurrent
      tasks per executor stay well inside a normal executor heap.

    There is no join anywhere in the plan (explode + one hash exchange +
    grouped map), hence trivially no BroadcastNestedLoopJoin / cartesian.
    The block-pair fan-out is ``explode(sequence(0, B-1))`` — plan size is
    constant in B (an array-literal formulation would blow past Catalyst's
    codegen method-size limits in the thousands of blocks).

    ``n_rows`` skips the sizing ``count()`` when the caller already knows
    the corpus size; when absent OR non-positive (a zero/negative hint is
    treated as absent, never as an empty corpus), one metadata-cheap count
    job runs before the O(n²) work it parameterizes. The hint only sizes
    the blocking — a wrong positive hint degrades block balance, not
    correctness.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    n = df.count() if n_rows is None or n_rows <= 0 else n_rows
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame([], "id_a LONG, id_b LONG, cosine DOUBLE")
    n_blocks = max(1, math.ceil(n / rows_per_block))
    vecs = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__vec__"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("__blk__"),
    )
    repl = vecs.select(
        id_col,
        "__vec__",
        "__blk__",
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("__j__"),
    ).select(
        id_col,
        "__vec__",
        "__blk__",
        F.least("__blk__", F.col("__j__")).alias("b1"),
        F.greatest("__blk__", F.col("__j__")).alias("b2"),
    )

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType(), False),
            T.StructField("id_b", T.LongType(), False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )

    def compare(key, pdf):
        b1, b2 = int(key[0]), int(key[1])
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.stack(pdf["__vec__"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
            {"id_a": np.int64, "id_b": np.int64, "cosine": np.float64}
        )
        if b1 == b2:
            a_ids, a_mat, a_norms = ids, mat, norms
            b_ids, b_mat, b_norms = ids, mat, norms
        else:
            am = pdf["__blk__"].to_numpy() == b1
            bm = ~am
            if not am.any() or not bm.any():
                return empty
            a_ids, a_mat, a_norms = ids[am], mat[am], norms[am]
            b_ids, b_mat, b_norms = ids[bm], mat[bm], norms[bm]
        # Row-chunked matmul: peak intermediate is a
        # (_MATMUL_CHUNK × |b|) float64 panel, not |a|×|b|.
        parts_ia, parts_ib, parts_cos = [], [], []
        for s in range(0, len(a_ids), _MATMUL_CHUNK):
            e = min(s + _MATMUL_CHUNK, len(a_ids))
            sims = (a_mat[s:e] @ b_mat.T) / np.maximum(
                np.outer(a_norms[s:e], b_norms), 1e-12
            )
            ii, jj = np.nonzero(sims >= threshold)
            if b1 == b2:
                # self block: keep strictly-upper pairs (global row < col)
                keep = (ii + s) < jj
                ii, jj = ii[keep], jj[keep]
            if len(ii):
                parts_ia.append(a_ids[ii + s])
                parts_ib.append(b_ids[jj])
                parts_cos.append(sims[ii, jj])
        if not parts_ia:
            return empty
        ia = np.concatenate(parts_ia)
        ib = np.concatenate(parts_ib)
        return pd.DataFrame(
            {
                "id_a": np.minimum(ia, ib),
                "id_b": np.maximum(ia, ib),
                "cosine": np.concatenate(parts_cos),
            }
        )

    return repl.groupBy("b1", "b2").applyInPandas(compare, schema=out_schema)


def ivf_auto_cells(n_vectors: int, cell_budget: int = 1024) -> int:
    """Derive the IVF cell count from the corpus size when the caller
    doesn't supply centroids: ``n_cells ≈ √(n / cell_budget)`` — the
    measured ``semantic_dedup`` sizing (SCALE.md: fixed small cell
    counts go quadratic inside cells as the corpus grows; cell counts
    proportional to n make the per-query centroid scan the bottleneck;
    the square-root schedule balances the two and the 100× probe found
    its sweet spot at k=64 for 5M docs ⇒ budget ≈ 1220)."""
    import math

    if n_vectors < 1:
        raise ValueError(f"n_vectors must be >= 1, got {n_vectors}")
    if cell_budget < 1:
        raise ValueError(f"cell_budget must be >= 1, got {cell_budget}")
    return max(1, round(math.sqrt(n_vectors / cell_budget)))


def _ivf_search(
    assigned: DataFrame,
    queries: DataFrame,
    centroids: "list[list[float]]",
    k: int,
    n_probe: int,
    id_col: str,
    vec_col: str,
    qid: str,
) -> DataFrame:
    """Search core shared by ``ivf_topk`` (in-flight assignment) and
    ``ivf_topk_indexed`` (standing on-disk index): pick each query's
    ``n_probe`` nearest cells driver-side (query sets are small by
    contract; centroid count is fixed — the ``knn_bruteforce`` broadcast
    policy), then brute-force only inside the probed cells."""
    import numpy as np

    cents = np.array(centroids, dtype=np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    q_local = queries.select(F.col(qid), F.col(vec_col)).collect()
    probe_rows = []
    for r in q_local:
        v = np.asarray(r[1], dtype=np.float64)
        v /= max(np.linalg.norm(v), 1e-12)
        # stable sort: equal similarities probe the lower cell id first
        # (deterministic, and replicable as ORDER BY sim DESC, cell ASC)
        order = np.argsort(-(cents @ v), kind="stable")
        for c in order[:n_probe]:
            probe_rows.append((int(r[0]), int(c)))
    spark = assigned.sparkSession
    from pangool_spark.data import local_relation

    probes = local_relation(spark, probe_rows, "query_id LONG, cell INT")

    candidates = assigned.join(F.broadcast(probes), "cell").select(
        F.col(id_col), F.col("query_id"), F.col(vec_col).alias("__cvec__")
    )
    q_df = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("__qvec__")
    )
    from pangool_spark.operators._udfs import cosine_udf

    scored = (
        candidates.join(F.broadcast(q_df), "query_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine_udf("__qvec__", "__cvec__").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: "list[list[float]] | None",
    k: int,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    cell_budget: int = 1024,
) -> DataFrame:
    """IVF-accelerated top-k: assign corpus vectors to cells once, assign
    each query to its ``n_probe`` nearest cells, and brute-force only inside
    the probed cells.

    The scale path for kNN when the query set is large: the corpus is
    partitioned (in practice: persisted cell-partitioned via
    ``build_ivf_index`` + ``ivf_topk_indexed``) by ``cell``, so each query
    touches |corpus|·n_probe/n_cells vectors instead of everything.
    Approximate by design (a true neighbor may live in an unprobed cell).
    ``centroids=None`` fits them here: ``ivf_auto_cells`` sizes the cell
    count from a corpus count (√(n/cell_budget)) and a sampled k-means
    supplies the centers — deterministic GIVEN the fit, so pass explicit
    centroids when oracle-checking. Output: (query_id, neighbor_id, rank).
    """
    qid = query_id_col or id_col
    if centroids is None:
        n_cells = ivf_auto_cells(corpus.count(), cell_budget)
        centroids = kmeans_centroids(corpus, n_cells, vec_col)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col, out_col="cell")
    return _ivf_search(
        assigned, queries, centroids, k, n_probe, id_col, vec_col, qid
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """IVF cell assignment: nearest centroid by cosine (centroids are plan
    literals; at real scale they come from a sampled k-means fit).

    Downstream ANN: partition/bucket the corpus by ``cell`` and have queries
    probe only their nearest cells — turns full scans into cell scans.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # argmax via array_max over (score, -cell) structs — LINEAR plan size
    # in k. The previous nested when-chain referenced the running best
    # TWICE per level, doubling the expression tree per centroid:
    # invisible at the k=4 fixtures, a measured driver-heap OOM at the
    # k=64 production sizing the 100× probe exercised. Ties keep the
    # LOWEST cell index (the -cell field), exactly the old chain's
    # strictly-greater-replaces semantics, so every oracle is unchanged.
    cands = []
    for ci, cvec in enumerate(centroids):
        p = F.array(*[F.lit(float(x)) for x in cvec])
        score = _dot(v, p) / F.greatest(_norm(v) * _norm(p), F.lit(1e-12))
        cands.append(
            F.struct(score.alias("score"), F.lit(-ci).alias("negcell"))
        )
    best = F.array_max(F.array(*cands))
    return df.withColumn(out_col, (-best["negcell"]).cast("int"))


def kmeans_centroids(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """Fit k-means and return centroids as plain lists — the concrete
    "at real scale centroids come from a sampled k-means fit" path that
    ``ivf_assign`` / ``ivf_topk`` / ``semantic_dedup`` document.

    Spark-first: MLlib's KMeans (k-means||, JVM, seeded) rather than a
    hand-rolled Lloyd loop. ``sample_fraction`` fits on a deterministic
    sample (seeded) — at 100 TB the fit runs on a few million vectors,
    never the corpus; assignment afterwards is the cheap broadcast pass.
    Returned centroids are plan literals, so downstream queries stay
    deterministic GIVEN the fit (the fit itself is seeded but depends on
    partitioning — pin centroids when oracle-checking downstream ops).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(
        array_to_vector(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "features"
        )
    )
    if sample_fraction is not None:
        feats = feats.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    centroids: "list[list[float]] | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_budget: int = 1024,
) -> "list[list[float]]":
    """Build and PERSIST a standing IVF index: vectors land in a
    cell-partitioned parquet layout (``{path}/vectors/cell=N/``) and the
    centroids in a tiny sidecar relation (``{path}/centroids``) — the
    ANN twin of ``dedup_index_lifecycle``'s digest/shingle store. Once
    the index stands, a search reads ONLY the probed cells (partition
    pruning on the ``cell`` directory key — |corpus|·n_probe/n_cells
    bytes, never the corpus) and a daily ingest appends O(batch) rows
    via ``append_ivf_index`` without touching standing cells.

    ``centroids=None`` fits them here (``ivf_auto_cells`` √(n/budget)
    sizing + sampled k-means). Returns the centroids in cell order.
    """
    spark = corpus.sparkSession
    if centroids is None:
        n_cells = ivf_auto_cells(corpus.count(), cell_budget)
        centroids = kmeans_centroids(corpus, n_cells, vec_col)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col, out_col="cell")
    assigned.write.mode("error").partitionBy("cell").parquet(f"{path}/vectors")
    from pangool_spark.data import local_relation

    local_relation(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell INT, centroid ARRAY<DOUBLE>",
    ).coalesce(1).write.mode("error").parquet(f"{path}/centroids")
    return centroids


def load_ivf_centroids(spark, path: str) -> "list[list[float]]":
    """Reload a standing index's centroids (cell order) — the tiny
    driver-side read every search and append starts with."""
    rows = spark.read.parquet(f"{path}/centroids").collect()
    return [list(r["centroid"]) for r in sorted(rows, key=lambda r: r["cell"])]


def append_ivf_index(
    batch: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Ingest a batch into a standing IVF index: assign against the
    STANDING centroids (never refit — cell meaning is frozen at build
    time, the contract that keeps old partitions valid) and append the
    new rows to their cell directories. O(batch) work; standing cells
    are untouched. Re-cluster by rebuilding when drift accumulates."""
    spark = batch.sparkSession
    centroids = load_ivf_centroids(spark, path)
    assigned = ivf_assign(batch, centroids, id_col, vec_col, out_col="cell")
    assigned.write.mode("append").partitionBy("cell").parquet(f"{path}/vectors")


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Top-k ANN against a STANDING on-disk IVF index — the production
    search regime: no assignment pass, and the probe join prunes the
    ``cell=N`` parquet partitions so only probed cells are read
    (|corpus|·n_probe/n_cells bytes per query batch). Same scoring,
    ranking, and determinism contract as ``ivf_topk``."""
    centroids = load_ivf_centroids(spark, path)
    assigned = spark.read.parquet(f"{path}/vectors")
    qid = query_id_col or id_col
    return _ivf_search(
        assigned, queries, centroids, k, n_probe, id_col, vec_col, qid
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    dim: int | None = None,
) -> "tuple[DataFrame, DataFrame]":
    """Per-dimension min-max SCALAR quantization of an embedding column
    to ``bits``-bit integer codes — the memory/IO side of ANN at scale:
    a 100 TB float32 corpus becomes ~25 TB of codes + one tiny bounds
    row, and search runs asymmetric (raw query × dequantized corpus, the
    ADC regime) with a bounded, engine-reproducible error of at most
    half a quantization step per dimension.

    Everything is a closed-form column expression — codebook = one
    min/max aggregate (no training, no RNG), codes = one map-side
    transform — so quantize → dequantize → search is fully
    value-oracle-able, unlike learned codebooks (PQ/OPQ), whose k-means
    seeds don't replicate across engines. The plan: one agg over the
    corpus → broadcast 1-row bounds → zero-shuffle projection.

    Returns ``(codes_df, bounds)``: (id_col, codes array<smallint>) and
    the 1-row (lo array<double>, hi array<double>) bounds relation.
    Constant dimensions (hi == lo) code to 0 and dequantize to lo.
    """
    if not 1 <= bits <= 15:
        raise ValueError(f"bits must be in [1, 15], got {bits}")
    levels = (1 << bits) - 1
    if dim is None:
        row = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if row is None:
            raise ValueError("cannot infer dim from an empty DataFrame")
        dim = row["d"]
    v = F.col(vec_col)
    bounds = df.agg(
        F.array(
            *[F.min(F.element_at(v, i + 1).cast("double")) for i in range(dim)]
        ).alias("lo"),
        F.array(
            *[F.max(F.element_at(v, i + 1).cast("double")) for i in range(dim)]
        ).alias("hi"),
    )
    lo, hi = F.col("lo"), F.col("hi")
    codes = (
        df.crossJoin(F.broadcast(bounds))
        .select(
            F.col(id_col),
            F.transform(
                v,
                lambda x, i: F.when(F.get(hi, i) == F.get(lo, i), F.lit(0))
                .otherwise(
                    F.round(
                        (x.cast("double") - F.get(lo, i))
                        / (F.get(hi, i) - F.get(lo, i))
                        * F.lit(float(levels))
                    )
                )
                .cast("smallint"),
            ).alias("codes"),
        )
    )
    return codes, bounds


def dequantize_embeddings(
    codes_df: DataFrame,
    bounds: DataFrame,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    bits: int = 8,
    out_col: str = "embedding",
) -> DataFrame:
    """Reconstruct double vectors from scalar-quantized codes:
    ``lo + (code / levels) * (hi - lo)`` per dimension — the exact
    binary64 expression an oracle replays, so reconstructions (hence
    downstream ranks and error stats) match bit-for-bit across engines.
    """
    levels = (1 << bits) - 1
    lo, hi = F.col("lo"), F.col("hi")
    return codes_df.crossJoin(F.broadcast(bounds)).select(
        F.col(id_col),
        F.transform(
            F.col(codes_col),
            lambda c, i: F.get(lo, i)
            + (c.cast("double") / F.lit(float(levels)))
            * (F.get(hi, i) - F.get(lo, i)),
        ).alias(out_col),
    )


def quantized_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k search (the ADC regime): the corpus is
    scalar-quantized (``quantize_embeddings``), queries stay full
    precision, ranking runs raw-query × dequantized-corpus cosine via
    ``knn_bruteforce``'s broadcast-query kernel. Output:
    (query_id, neighbor_id, rank) — same contract as the exact search,
    so recall against it is directly measurable.
    """
    codes, bounds = quantize_embeddings(
        corpus, id_col=id_col, vec_col=vec_col, bits=bits
    )
    recon = dequantize_embeddings(
        codes, bounds, id_col=id_col, bits=bits, out_col=vec_col
    )
    return knn_bruteforce(recon, queries, k, id_col=id_col, vec_col=vec_col)


def rrf_fuse(
    rankings: "list[DataFrame]",
    c: int = 60,
    query_col: str = "query_id",
    item_col: str = "item_id",
    rank_col: str = "rank",
    top_k: int | None = None,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher SIGIR'09) of N
    per-query rankings — the standard hybrid-retrieval combiner (BM25 ×
    embedding ANN) in every modern RAG / training-data retrieval stack:
    score(q, d) = Σ_rankers 1/(c + rank_r(q, d)), items missing from a
    ranker simply contribute nothing.

    Deterministic and fully value-oracle-able: ranks are integers, each
    contribution is ONE exact-rounded double divide, and the per-item
    sum folds the SORTED contribution list (the bm25 pattern) so any
    partitioning produces bit-identical scores; final ranking breaks
    ties on item id. The plan: one union of the (already tiny, top-k ×
    queries) ranking relations, one partial-combined aggregate, one
    per-query WindowGroupLimit — nothing here scales with the corpus,
    only with Σ|rankings|.

    Output: (query_col, item_col, n_rankers, rrf_score, rank).
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if c <= 0:
        raise ValueError(f"c must be > 0, got {c}")
    parts = [
        r.select(
            F.col(query_col),
            F.col(item_col),
            (
                F.lit(1.0) / (F.lit(float(c)) + F.col(rank_col).cast("double"))
            ).alias("__contrib__"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(query_col, item_col).agg(
        F.count(F.lit(1)).alias("n_rankers"),
        F.aggregate(
            F.sort_array(F.collect_list("__contrib__")),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("rrf_score"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(item_col).asc()
    )
    out = fused.withColumn("rank", F.row_number().over(w))
    if top_k is not None:
        out = out.filter(F.col("rank") <= top_k)
    return out


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for each
    query vector, the top-k most-similar corpus vectors with a DIFFERENT
    label — the negatives that sit closest to the decision boundary and
    carry the most gradient signal (in-batch random negatives are mostly
    trivial at scale; every modern dual-encoder recipe mines hard ones).

    Shape: same broadcast-query scan as ``knn_bruteforce`` — the (small)
    query relation broadcasts WITH its labels, each corpus partition
    scores its slab with one BLAS matmul, masks same-label columns, and
    emits per-partition partial top-k so the shuffle carries O(parts·k)
    rows per query, never the corpus. At 100 TB the corpus is scanned
    once, embarrassingly parallel; for standing query sets the IVF path
    (``ivf_topk``) with a label-filtered probe is the indexed regime.

    Output: (query_id, neighbor_id, rank) — rank 1..k by cosine DESC,
    neighbor id ASC tie-break; self-pairs excluded by id.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("vc"), F.col(label_col).alias("lb")
    )
    q_local = queries.select(F.col(id_col), F.col(vec_col), F.col(label_col)).collect()
    if not q_local:
        return corpus.sparkSession.createDataFrame(
            [], "query_id LONG, neighbor_id LONG, rank INT"
        )
    q_ids = np.array([r[0] for r in q_local], dtype=np.int64)
    q_mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_local])
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    q_lbl = np.array([r[2] for r in q_local], dtype=np.int64)
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat, q_lbl))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )

    def score_partition(batches):
        ids, mat, lbl = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_lbl = pdf["lb"].to_numpy(dtype=np.int64)
            c_mat = np.stack(pdf["vc"].to_numpy()).astype(np.float64)
            c_mat /= np.maximum(
                np.linalg.norm(c_mat, axis=1, keepdims=True), 1e-12
            )
            scores = c_mat @ mat.T
            # same-label columns can never be negatives: mask before top-k
            scores[c_lbl[:, None] == lbl[None, :]] = -np.inf
            kk = min(k, len(c_ids))
            top = np.argpartition(-scores, kk - 1, axis=0)[:kk]
            rows = {"query_id": [], "neighbor_id": [], "cosine": []}
            for j in range(len(ids)):
                for i in top[:, j]:
                    if np.isfinite(scores[i, j]) and c_ids[i] != ids[j]:
                        rows["query_id"].append(ids[j])
                        rows["neighbor_id"].append(c_ids[i])
                        rows["cosine"].append(scores[i, j])
            yield pd.DataFrame(rows)

    partial = c.mapInPandas(score_partition, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: "Sequence[int] | None" = None,
    scale: int = 100_000,
) -> DataFrame:
    """Covariance matrix of embedding dimensions in ONE aggregate pass —
    the statistic behind whitening / PCA-projection decisions on an
    embedding corpus (is the representation isotropic? which dims are
    redundant?). For |dims| = d it emits the d(d+1)/2 upper triangle as
    rows, computed as d(d+3)/2 + 1 algebraic sums in a single
    partial-combined groupBy().agg — no explode, no self-join, no
    per-row Python; at 100 TB this is exactly one map-side-combined scan
    with a 1-row reduce.

    Determinism contract: each component is quantized to integer units
    of 1/scale (one double multiply + round — identical IEEE ops in any
    engine), the Σx / Σxy accumulate as exact BIGINTs, and the final
    covariance is a fixed IEEE double expression over those ints —
    value-oracleable bit-exactly. BIGINT headroom: |x|·scale ≤ 1e6-ish
    components give Σxy ≤ 1e10·n — fine past 10^8 rows; drop ``scale``
    one decade per 100× rows beyond that.

    ``dims`` are 1-based positions (default: all of a 64-dim layout is
    usually more matrix than a human wants — pass the slice you need).
    Output: (i, j, n, mean_i, mean_j, cov) with i <= j, population
    covariance (divide-by-n).
    """
    if dims is None:
        dims = list(range(1, 65))
    dims = list(dims)
    if not dims or len(set(dims)) != len(dims):
        raise ValueError("dims must be a nonempty list of distinct 1-based positions")

    def q(i: int):
        return F.round(
            F.element_at(F.col(vec_col), i).cast("double") * F.lit(float(scale))
        ).cast("bigint")

    rows = df.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) >= max(dims))
    )
    # Project each quantized component ONCE, then aggregate plain column
    # refs: inlining q(i) into every product re-evaluates the
    # round/cast chain ~d times per component per row and inflates the
    # generated aggregate method ~d-fold (compile tax dominates at small
    # scale; redundant per-row work at large). Same ops per value, so
    # every sum is bit-identical.
    rows = rows.select(*[q(i).alias(f"__q{i}__") for i in dims])
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for i in dims:
        aggs.append(F.sum(F.col(f"__q{i}__")).alias(f"__s{i}__"))
    for a in range(len(dims)):
        for b in range(a, len(dims)):
            i, j = dims[a], dims[b]
            aggs.append(
                F.sum(F.col(f"__q{i}__") * F.col(f"__q{j}__")).alias(
                    f"__p{i}_{j}__"
                )
            )
    wide = rows.agg(*aggs)

    n = F.col("__n__").cast("double")
    sc = float(scale)
    parts = []
    for a in range(len(dims)):
        for b in range(a, len(dims)):
            i, j = dims[a], dims[b]
            mi = F.col(f"__s{i}__").cast("double") / n / F.lit(sc)
            mj = F.col(f"__s{j}__").cast("double") / n / F.lit(sc)
            cov = (
                F.col(f"__p{i}_{j}__").cast("double") / n / F.lit(sc * sc)
                - mi * mj
            )
            parts.append(
                F.struct(
                    F.lit(i).alias("i"),
                    F.lit(j).alias("j"),
                    F.col("__n__").alias("n"),
                    mi.alias("mean_i"),
                    mj.alias("mean_j"),
                    cov.alias("cov"),
                )
            )
    return wide.select(
        F.explode(F.array(*parts)).alias("__c__")
    ).select("__c__.*")
