"""Graph helpers for dedup clustering: connected components via label
propagation.

No reference counterpart (Pangool chains MapReduce jobs for iteration —
``EX/gameoflife``); Spark-first shape: each round is one join + one
aggregate, lineage truncated per round by ``plans.iterate``'s
localCheckpoint discipline. Converges in O(diameter) rounds; duplicate
clusters have tiny diameters in practice, so ``max_iterations`` defaults
low and convergence is checked with a cheap count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
    algorithm: str = "auto",
    probe_rounds: int = 8,
) -> DataFrame:
    """Connected components. Output: (vertex, component) where component =
    min vertex id in the component.

    ``algorithm``:

    - ``auto`` (default): probe label propagation for ``probe_rounds``
      rounds; if the fixpoint is still moving, abandon the probe and run
      ``star`` from scratch. Removes the caller's diameter guess: the
      shallow-graph common case (duplicate clusters, diameter 2-3) pays
      nothing extra, and a pathological high-diameter graph costs at most
      ``probe_rounds`` wasted join+agg passes before the O(log² n)
      algorithm takes over.
    - ``label``: label propagation — every vertex adopts the minimum
      label among itself and its neighbors until fixpoint. One join + one
      aggregate per round, but rounds = graph DIAMETER. Right when the
      caller KNOWS diameters are tiny.
    - ``star``: the alternating large-star/small-star algorithm
      (Kiveris et al., "Connected Components in MapReduce and Beyond",
      SoCC'14) — O(log² n) rounds regardless of diameter, each round two
      join+aggregate passes over the shrinking edge set. Right for
      high-diameter graphs (long chains, meshes); at 100 TB the round
      count, not the per-round cost, is the scale limit.

    ``label``/``star`` raise ``RuntimeError`` if the fixpoint is not
    reached within ``max_iterations`` — a truncated run would silently
    split components. ``auto`` raises only if the star fallback itself
    fails to converge.
    """
    if algorithm == "auto":
        labels, converged = _label_propagation(edges, src, dst, probe_rounds)
        if converged:
            return labels
        return _alternating_stars(edges, src, dst, max_iterations)
    if algorithm == "star":
        return _alternating_stars(edges, src, dst, max_iterations)
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r}: auto|label|star")
    labels, converged = _label_propagation(edges, src, dst, max_iterations)
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds; "
            "raise max_iterations"
        )
    return labels


def _label_propagation(
    edges: DataFrame, src: str, dst: str, max_iterations: int
) -> tuple[DataFrame, bool]:
    # Materialize the symmetrized edge list ONCE: every round joins against
    # it, and without the checkpoint each round re-executes the caller's
    # full pair-generation lineage — twice, since the union reads `edges`
    # two ways. (The pair pipelines feeding this are inverted-index joins;
    # re-running one per round turned a 2-round propagation into the
    # dominant cost of near_dedup_clusters.)
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint(eager=True)
    )

    # Labels are non-increasing (every update is a min), so the label SUM
    # strictly decreases until the fixpoint: comparing one scalar per round
    # replaces the old change-count join (2 joins + a count job per round
    # → 1 join + 1 aggregate). Decimal sum: 10^9 vertices × 10^18 ids
    # overflows int64, and a silent wrap would fake convergence.
    def label_sum(df: DataFrame):
        return df.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = label_sum(labels)
    converged = False
    for _ in range(max_iterations):
        # each neighbor contributes its label to vertex u; the vertex's own
        # label rides along via the union, so one min-aggregate computes
        # least(self, min(neighbors)) without a second join
        contributions = sym.join(labels, sym.v == labels.vertex).select(
            F.col("u").alias("vertex"), "component"
        )
        labels = (
            contributions.unionByName(labels.select("vertex", "component"))
            .groupBy("vertex")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        new_sum = label_sum(labels)
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    return labels, converged


def _alternating_stars(
    edges: DataFrame, src: str, dst: str, max_iterations: int
) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al., SoCC'14 §3).

    One round = large-star then small-star, each a groupBy-min + join over
    the current edge set:

    - large-star: every vertex u links each STRICTLY LARGER neighbor to
      m(u) = min(N(u) ∪ {u});
    - small-star: orient edges (big, small); every vertex u links each
      smaller neighbor AND ITSELF to its minimum neighbor.

    At fixpoint each component is a star rooted at its minimum vertex, so
    the final edge list IS the (vertex, component) mapping. Convergence is
    detected by comparing (edge count, decimal sum of per-edge xxhash64)
    across rounds — the paper's per-round change counter costs an extra
    subtract-join; a 128-bit-ish scalar fingerprint is one aggregate, and
    a false "converged" needs a sum collision across two iterations of the
    same shrinking edge multiset (~2⁻⁶⁴)."""
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # vertex universe from the UNFILTERED list: a vertex whose only edges
    # are self-loops must still appear (as its own singleton component),
    # matching the label algorithm's contract on identical input
    all_vertices = (
        raw.select(F.col("u").alias("vertex"))
        .unionByName(raw.select(F.col("v").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = (
        raw.filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def fingerprint(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("s"),
        ).collect()[0]
        return row["n"], row["s"]

    def large_star(df: DataFrame) -> DataFrame:
        sym = df.unionByName(
            df.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # m(u) = min(N(u) ∪ {u}): neighbors' min, clamped by u itself
        m = sym.groupBy("u").agg(F.min("v").alias("__mn__"))
        m = m.select("u", F.least("u", "__mn__").alias("m"))
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(df: DataFrame) -> DataFrame:
        # orient (big, small): u > v for every edge
        oriented = df.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        # all neighbors here are < u, so m = min neighbor (< u always)
        m = oriented.groupBy("u").agg(F.min("v").alias("m"))
        with_m = oriented.join(m, "u")
        link_neighbors = with_m.select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).filter(F.col("u") != F.col("v"))
        link_self = m.select("u", F.col("m").alias("v"))
        return link_neighbors.unionByName(link_self).distinct()

    prev = fingerprint(e)
    converged = False
    for _ in range(max_iterations):
        e = small_star(large_star(e)).localCheckpoint(eager=True)
        cur = fingerprint(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components(star) did not converge in {max_iterations} "
            "rounds; raise max_iterations"
        )
    # Fixpoint edge set = stars (non-root → root), oriented big→small by
    # small_star. Roots and isolated-after-filter vertices map to themselves.
    star_edges = e.groupBy(F.col("u").alias("vertex")).agg(
        F.min("v").alias("__comp__")
    )
    return all_vertices.join(star_edges, "vertex", "left").select(
        "vertex", F.coalesce("__comp__", "vertex").alias("component")
    )


def cluster_representatives(components: DataFrame) -> DataFrame:
    """(vertex, component) → surviving vertex per cluster (the component
    id itself, which is the min member)."""
    return components.select(F.col("component").alias("vertex")).distinct()


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank — the canonical chained-MapReduce workload
    (the reference iterates by resubmitting jobs, ``EX/gameoflife``
    pattern); Spark-first shape: each iteration is one equi-join of the
    rank vector against the out-edge list plus one partial-combined
    aggregate, with lineage truncated every ``checkpoint_every`` rounds.

    Deterministic-by-construction so a VALUE oracle can replicate it:
    per-target contributions rank/outdeg are computed in double (one
    exact-rounded divide), summed as decimal(38,18) (order-independent —
    a shuffled cluster run produces bit-identical ranks), then the
    damping update runs in double. Dangling nodes (no out-edges) retain
    the teleport term only, the common simplification; N = distinct
    nodes appearing anywhere in the edge list.

    Output: (node, rank) after ``iterations`` rounds from the uniform
    start. O(E) shuffle per round, rank vector O(V).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src).alias("__s__"), F.col(dst).alias("__d__")).distinct()
    nodes = (
        e.select(F.col("__s__").alias("node"))
        .unionByName(e.select(F.col("__d__").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    outdeg = e.groupBy("__s__").agg(F.count(F.lit(1)).alias("__deg__"))
    links = e.join(outdeg, "__s__")  # (src, dst, outdeg)

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    teleport = (1.0 - damping) / n_nodes
    for i in range(iterations):
        contrib = (
            links.join(ranks, F.col("__s__") == F.col("node"))
            .select(
                F.col("__d__").alias("node"),
                (F.col("rank") / F.col("__deg__"))
                .cast("decimal(38,18)")
                .alias("__c__"),
            )
            .groupBy("node")
            .agg(F.sum("__c__").alias("__sum__"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.lit(damping)
                * F.coalesce(
                    F.col("__sum__").cast("double"), F.lit(0.0)
                )
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count over an undirected graph — the classic
    graph-analytics benchmark, via degree-ordered edge orientation
    (Suri & Vassilvitskii's MR-era technique, "Counting Triangles and the
    Curse of the Last Reducer", WWW'11): orient every undirected edge
    from the lower-(degree, id) endpoint to the higher, so each triangle
    is counted EXACTLY once as a directed wedge a→b, a→c closed by b→c,
    and the wedge fan-out per vertex is bounded by out-degree ≤ O(√E) —
    the hub vertex never enumerates its full neighborhood square.

    Self-loops and duplicate/reverse edges are cleaned first. Two
    shuffles: the degree aggregate and the adjacency-array build; the
    counting joins ride the oriented edge relation. Output: one row
    (n_triangles).
    """
    # `sym` feeds THREE plan branches (two degree-union arms and the
    # ranked join) and `oriented` three (the adjacency build and both
    # sides of the counting join). Without materialization Spark
    # re-inlines the whole upstream edge pipeline per branch — over the
    # co-purchase generator the plan carried 22 parquet scans and 22
    # explodes with zero exchange reuse. The canonical edge set is 16
    # bytes/row, so two eager localCheckpoints (the lpa_communities/kcore
    # discipline) collapse that to one upstream pass each; at 100 TB the
    # edge list is the lightweight proxy relation (guide §8), never the
    # raw corpus.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        sym.select(F.col("a").alias("v"))
        .unionByName(sym.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    ranked = sym.join(da, "a").join(db, "b")
    # orient: lower (degree, id) -> higher
    oriented = ranked.select(
        F.when(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
            F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
        )
        .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("w")))
        .alias("e")
    ).select("e.u", "e.w").localCheckpoint(eager=True)
    # Edge-iterator counting (r12): in the degree-ordered DAG, triangle
    # {a,b,c} with rank(a)<rank(b)<rank(c) carries edges a→b, a→c, b→c
    # and is counted EXACTLY once on edge (a,b) as c ∈ N⁺(a) ∩ N⁺(b).
    # So n_triangles = Σ over DAG edges (u,w) of |N⁺(u) ∩ N⁺(w)| with
    # per-vertex sorted out-neighbor arrays. This replaces the wedge
    # self-join + closing semi-join: the Θ(Σ d⁺²) wedge ROW STREAM never
    # materializes — the same work happens as JVM array intersections
    # over Σ_edges (d⁺(u)+d⁺(w)) array cells, and the out-degree bound
    # d⁺ ≤ O(√E) caps every array. Measured 15.3 s → 5.6 s at sf0.1
    # local[32] (identical count, 1,884,488).
    adj = oriented.groupBy("u").agg(F.sort_array(F.collect_list("w")).alias("ns"))
    au = adj.select(F.col("u"), F.col("ns").alias("__nu__"))
    aw = adj.select(F.col("u").alias("w"), F.col("ns").alias("__nw__"))
    # inner joins: an edge whose endpoint has no out-neighbors contributes
    # 0 to the sum, so dropping it is value-neutral
    closed = oriented.join(au, "u").join(aw, "w")
    return closed.agg(
        F.coalesce(
            F.sum(F.size(F.array_intersect("__nu__", "__nw__"))), F.lit(0)
        ).cast("long").alias("n_triangles")
    )


def triangle_count_approx(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    p: float = 0.3,
    hash_family: str = "fast",
) -> DataFrame:
    """Approximate triangle count via DETERMINISTIC edge sampling
    (DOULION, Tsourakakis et al. KDD'09): keep each undirected edge with
    probability ``p`` by a content hash (no RNG — reruns are
    bit-identical), count triangles exactly on the sampled graph, scale
    by 1/p³. Unbiased, variance ~T/p³; the point at 100 TB is the wedge
    bill: exact counting is Θ(E^1.5) wedge rows, sampling at p cuts it
    by p^1.5 while the estimate concentrates for triangle-dense graphs.

    ``hash_family`` (the minhash pattern, r07 verdict: the md5 sampling
    tax at bench scale outweighed the saved wedges, inverting the whole
    point of the approximation):

    - ``'fast'`` (production default) — ``xxhash64`` straight on the raw
      endpoint columns: one JVM codegen'd hash per edge, no string
      concat, no md5. Deterministic across runs/partitions but
      engine-INTERNAL (rows-only checkable).
    - ``'portable'`` — md5-derived 31-bit hash of ``a:b`` (the
      ``base_hash_31`` contract), bit-replicable in any engine so even
      the approximate count carries a full value oracle.

    Output: (n_sampled_triangles, scale, n_triangles_est).
    """
    if not 0.0 < p <= 1.0:
        raise ValueError("p must be in (0, 1]")
    if hash_family not in ("fast", "portable"):
        raise ValueError(f"unknown hash_family {hash_family!r}: fast|portable")
    from pangool_spark.operators.dedup import base_hash_31

    canon = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    threshold = int(p * 1_000_000)
    if hash_family == "fast":
        edge_hash = F.pmod(F.xxhash64(F.col("a"), F.col("b")), F.lit(1_000_000))
    else:
        key = F.concat_ws(":", F.col("a"), F.col("b"))
        edge_hash = base_hash_31(key) % 1_000_000
    sampled = canon.filter(edge_hash < threshold)
    scale = 1.0 / (p * p * p)
    return (
        triangle_count(sampled, "a", "b")
        .select(
            F.col("n_triangles").alias("n_sampled_triangles"),
            F.lit(scale).alias("scale"),
            (F.col("n_triangles") * F.lit(scale)).alias("n_triangles_est"),
        )
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 3,
    checkpoint_every: int = 1,
) -> DataFrame:
    """k-core peeling, ``max_iter`` FIXED rounds: repeatedly drop
    vertices whose degree in the surviving subgraph is < ``k`` (and the
    edges they carry). The fixed iteration count is the same value-
    oracle contract as ``pagerank``: the oracle unrolls exactly
    ``max_iter`` peels, so results are comparable engine-to-engine even
    when the peel hasn't converged (a converged core is a fixpoint —
    extra rounds are no-ops; the operator reports convergence via the
    monotone edge count). Each round is one degree aggregate + two
    semi-joins; like ``pagerank``, the loop truncates lineage itself
    (``localCheckpoint`` every ``checkpoint_every`` rounds) so the plan
    stays per-round-bounded instead of compounding — raising
    ``max_iter`` never recompiles an ever-deeper DAG.

    Self-loops and duplicate/reverse edges are cleaned first (the
    ``triangle_count`` contract). Output: the surviving canonical
    (a < b) undirected edges.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    cur = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    for i in range(max_iter):
        deg = (
            cur.select(F.col("a").alias("v"))
            .unionByName(cur.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("v")
        cur = cur.join(
            keep.select(F.col("v").alias("a")), "a", "left_semi"
        ).join(keep.select(F.col("v").alias("b")), "b", "left_semi")
        if (i + 1) % checkpoint_every == 0 and i + 1 < max_iter:
            cur = cur.localCheckpoint(eager=True)
    return cur.select("a", "b")


def edge_support(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-edge triangle SUPPORT (how many triangles contain the edge) —
    the k-truss building block. Same degree-ordered orientation as
    ``triangle_count`` (wedge fan-out ≤ O(√E)), but the wedge-closing
    join runs INNER to keep the triangle tuples, which then explode
    into their three canonical edges for one count aggregate. Edges in
    no triangle report support 0 (kept via left join).

    Output: canonical (a < b, support BIGINT).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    deg = (
        sym.select(F.col("a").alias("v"))
        .unionByName(sym.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    oriented = (
        sym.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("w")))
            .alias("e")
        )
        .select("e.u", "e.w")
    )
    w1 = oriented.select("u", F.col("w").alias("w1"))
    w2 = oriented.select("u", F.col("w").alias("w2"))
    wedges = w1.join(w2, "u").filter(F.col("w1") < F.col("w2"))
    tri = wedges.join(
        sym, (F.col("w1") == F.col("a")) & (F.col("w2") == F.col("b"))
    ).select("u", "w1", "w2")
    tri3 = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("u", "w1").alias("a"), F.greatest("u", "w1").alias("b")
                ),
                F.struct(
                    F.least("u", "w2").alias("a"), F.greatest("u", "w2").alias("b")
                ),
                F.struct(F.col("w1").alias("a"), F.col("w2").alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    sup = tri3.groupBy("a", "b").agg(F.count(F.lit(1)).alias("__s__"))
    return sym.join(sup, ["a", "b"], "left").select(
        "a", "b", F.coalesce("__s__", F.lit(0)).alias("support")
    )


def ktruss(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 2,
    checkpoint_every: int = 1,
) -> DataFrame:
    """k-truss peeling, ``max_iter`` FIXED rounds: repeatedly drop edges
    in fewer than k−2 triangles of the surviving subgraph — the
    edge-cohesion sibling of ``kcore`` (every edge of a k-truss lies in
    a (k−2)-connected triangle mesh; cores bound vertices, trusses bind
    EDGES). Same fixed-iteration value-oracle contract as kcore /
    pagerank: the oracle unrolls exactly ``max_iter`` support+filter
    rounds, so mid-peel and fixpoint states are both pinned. Each round
    costs one triangle enumeration (the Θ(E^1.5) wedge bill — why
    ``max_iter`` stays small; converged trusses are fixpoints), and the
    loop truncates lineage itself (``localCheckpoint`` every
    ``checkpoint_every`` rounds, the ``pagerank`` discipline) so the
    per-round plan never compounds.

    Output: the surviving canonical (a < b) undirected edges.
    """
    if k < 3:
        raise ValueError(f"k must be >= 3 (a 2-truss is every edge), got {k}")
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    cur = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    for i in range(max_iter):
        cur = (
            edge_support(cur, "src", "dst")
            .filter(F.col("support") >= k - 2)
            .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < max_iter:
            cur = cur.localCheckpoint(eager=True)
    return cur.select(F.col("src").alias("a"), F.col("dst").alias("b"))


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_iter: int = 3,
    src: str = "src",
    dst: str = "dst",
    seed_col: str | None = None,
) -> DataFrame:
    """Multi-source BFS hop distances over the undirected graph,
    ``max_iter`` FIXED rounds — the kcore/pagerank value-oracle
    contract: the oracle unrolls exactly ``max_iter`` expansion rounds,
    so engine results are comparable even before the frontier dies out.

    Frontier discipline (the part label propagation lacks): each round
    joins only the vertices FIRST REACHED last round against the
    adjacency — settled vertices never re-shuffle, so round cost tracks
    the frontier size, not |V|. A round is one equi-join + distinct +
    one anti-join against the settled set. Vertices unreached after
    ``max_iter`` rounds are absent from the output (their true distance
    is unknown, not infinite — report, don't guess). At larger round
    counts, checkpoint every ~10 rounds (``plans.iterate``) to truncate
    the settled-set lineage.

    Output: (v, dist) with dist in [0, max_iter], dist 0 = seed.
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    # The adjacency feeds every round's frontier join; un-materialized,
    # each round (and each settled-set anti-join arm) re-inlines the whole
    # upstream edge pipeline — the 3-round co-purchase plan carried 192
    # parquet scans. One eager localCheckpoint (the lpa_communities
    # discipline) makes every round read the 16-bytes/row edge list.
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    if seed_col is None:
        seed_col = seeds.columns[0]
    dist = (
        seeds.select(F.col(seed_col).alias("v"))
        .distinct()
        .withColumn("dist", F.lit(0))
    )
    frontier = dist.select("v")
    for i in range(1, max_iter + 1):
        reached = (
            frontier.join(sym, frontier["v"] == sym["a"])
            .select(F.col("b").alias("v"))
            .distinct()
        )
        new = reached.join(dist, "v", "left_anti").withColumn(
            "dist", F.lit(i)
        )
        dist = dist.unionByName(new)
        frontier = new.select("v")
    return dist


def lpa_communities(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan
    et al., Phys. Rev. E 76, 2007), made deterministic: every vertex
    starts labeled with its own id, and each round every vertex adopts
    its neighbors' most frequent label, ties broken toward the SMALLEST
    label — no randomized visit order, so reruns and engines agree
    bit-for-bit. ``rounds`` is FIXED (the kcore/bfs/pagerank
    value-oracle contract: the oracle unrolls the same rounds; a
    synchronous LPA may two-cycle on bipartite structures, which a
    fixed cut observes rather than hides).

    Not ``connected_components``: min-label propagation floods a whole
    component with one label; frequency voting SPLITS dense regions
    from each other — the label that wins a vertex is the one backed by
    the most neighbors, so bridges lose to cores.

    Each round is one equi-join (labels onto the symmetrized adjacency,
    shuffled by vertex) + one count aggregate + a rank-1
    WindowGroupLimit — all keyed by vertex id; no per-round growth, no
    driver collect. Self-loops are dropped; vertices keep round-r−1
    labels only through their neighbors (every graph vertex has ≥1
    neighbor by construction).

    Output: (v, label) after ``rounds`` rounds; vertices sharing a
    label are one community.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = sym.select(F.col("a").alias("v")).distinct().withColumn(
        "label", F.col("v")
    )
    try:
        n_shuffle = int(
            edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (TypeError, ValueError):  # "auto" on some deployments
        n_shuffle = edges.sparkSession.sparkContext.defaultParallelism
    for _ in range(rounds):
        votes = (
            sym.join(labels.withColumnRenamed("v", "a"), "a")
            .select(F.col("b").alias("v"), "label")
            # ONE exchange per round (r12, guide §2.4): an explicit hash
            # repartition on v satisfies the clustering of BOTH aggregates
            # below — HashPartitioning(v) clusters (v, label) rows and the
            # final per-v argmax alike — where the former shape paid two
            # exchanges per round (partial-agg shuffle on (v, label), then
            # a second on v). Raw vote rows shuffle unreduced, but they are
            # 16-byte pairs and the dense-graph partial agg was reducing
            # little; measured 5.26 s → 3.53 s for 3 rounds at sf0.1
            # local[32], bit-identical labels.
            .repartition(n_shuffle, "v")
            .groupBy("v", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # argmax as a hash aggregate with partial/map-side combining
        # instead of a rank-1 window: min over (-c, label) is "largest
        # count, then smallest label" — same winner as the former
        # row_number window without its per-round exchange + full sort
        # (guide §2.4: window partitioned like the aggregation it
        # follows is a second pass the agg can absorb).
        labels = votes.groupBy("v").agg(
            F.min_by(
                "label", F.struct((-F.col("c")).alias("nc"), F.col("label"))
            ).alias("label")
        )
    return labels


def link_prediction(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 1,
    max_apex_degree: int | None = None,
) -> DataFrame:
    """Common-neighbor link prediction over an undirected graph: for
    every NON-adjacent pair (u < v) sharing at least ``min_common``
    neighbors, the common-neighbor count and the neighborhood Jaccard
    common / (deg_u + deg_v − common) — the classic 'people you may
    know' / co-purchase-recommendation primitive (Liben-Nowell &
    Kleinberg CIKM'03).

    Spark-first shape: candidate pairs stream out of one adjacency
    self-join on the wedge apex (the triangle operator's wedge pattern —
    pairs never materialize beyond apexes they actually share), one
    partial-combined count, one anti-join against the edge set and two
    degree joins. The wedge bill is Σ deg(apex)² — exact by default;
    ``max_apex_degree`` prunes super-hub apexes first (the minhash
    ``max_gram_df`` regime: common counts then include only apexes of
    degree ≤ cap, documented approximation for power-law hubs — degrees
    and adjacency stay exact).

    Integer counts and ONE exact-rounded double divide per pair, so the
    whole output is value-oracle-able. Output: (u, v, common_neighbors,
    deg_u, deg_v, jaccard).
    """
    if min_common < 1:
        raise ValueError("min_common must be >= 1")
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    adj = sym.select(F.col("a").alias("apex"), F.col("b").alias("n")).unionByName(
        sym.select(F.col("b").alias("apex"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("apex").agg(F.count(F.lit(1)).alias("d"))
    wedge_src = adj
    if max_apex_degree is not None:
        keep = deg.filter(F.col("d") <= max_apex_degree).select("apex")
        wedge_src = adj.join(keep, "apex", "left_semi")
    x = wedge_src.select("apex", F.col("n").alias("u"))
    y = wedge_src.select("apex", F.col("n").alias("v"))
    common = (
        x.join(y, "apex")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
        .filter(F.col("common_neighbors") >= min_common)
    )
    cand = common.join(
        sym,
        (F.col("u") == F.col("a")) & (F.col("v") == F.col("b")),
        "left_anti",
    )
    du = deg.select(F.col("apex").alias("u"), F.col("d").alias("deg_u"))
    dv = deg.select(F.col("apex").alias("v"), F.col("d").alias("deg_v"))
    return (
        cand.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common_neighbors",
            "deg_u",
            "deg_v",
            (
                F.col("common_neighbors").cast("double")
                / (
                    F.col("deg_u") + F.col("deg_v") - F.col("common_neighbors")
                ).cast("double")
            ).alias("jaccard"),
        )
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: "Sequence",
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Personalized PageRank / random-walk-with-restart from a bounded
    SEED set — the recommendation walk ("parts customers like yours end
    up at"): identical round structure to ``pagerank`` (one equi-join +
    one decimal-summed partial aggregate per round, bit-identical under
    any partitioning), but ALL teleport mass returns to the seeds —
    rank_0 = 1/|S| on seeds, teleport = (1−d)/|S| on seeds and 0
    elsewhere, so scores measure proximity to the seed set instead of
    global centrality.

    Seeds are plan literals (the bounded-query-set contract the kNN /
    decontamination operators use); every seed must exist in the edge
    list — a missing seed would silently leak walk mass, so it raises
    instead. Dangling nodes keep the teleport-only simplification.
    Output: (node, rank) — unreachable non-seeds legitimately hold 0.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    seed_list = sorted(set(seeds))
    if not seed_list:
        raise ValueError("seeds must be non-empty")
    s = len(seed_list)
    e = edges.select(F.col(src).alias("__s__"), F.col(dst).alias("__d__")).distinct()
    nodes = (
        e.select(F.col("__s__").alias("node"))
        .unionByName(e.select(F.col("__d__").alias("node")))
        .distinct()
    )
    n_found = nodes.filter(F.col("node").isin(seed_list)).count()
    if n_found != s:
        raise ValueError(
            f"{s - n_found} seed(s) absent from the graph — teleport mass "
            "would silently vanish; drop them explicitly"
        )
    outdeg = e.groupBy("__s__").agg(F.count(F.lit(1)).alias("__deg__"))
    links = e.join(outdeg, "__s__")
    is_seed = F.col("node").isin(seed_list)
    teleport = F.when(is_seed, F.lit((1.0 - damping) / s)).otherwise(F.lit(0.0))
    ranks = nodes.select(
        "node",
        F.when(is_seed, F.lit(1.0 / s)).otherwise(F.lit(0.0)).alias("rank"),
    )
    for i in range(iterations):
        contrib = (
            links.join(ranks, F.col("__s__") == F.col("node"))
            .select(
                F.col("__d__").alias("node"),
                (F.col("rank") / F.col("__deg__"))
                .cast("decimal(38,18)")
                .alias("__c__"),
            )
            .groupBy("node")
            .agg(F.sum("__c__").alias("__sum__"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                teleport
                + F.lit(damping)
                * F.coalesce(F.col("__sum__").cast("double"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Unnormalized HITS (Kleinberg JACM'99) hub/authority scores over a
    directed graph, fixed iteration count.

    Spark-first shape matches ``pagerank``: each half-round is ONE
    equi-join + one partial-combined aggregate over the edge list.  The
    normalization step of textbook HITS is deliberately dropped — with
    integer initial scores the whole recursion stays in EXACT integer
    arithmetic (auth := Σ hub over in-edges; hub := Σ auth over
    out-edges), so the result is bit-identical under any partitioning
    AND expressible as unrolled SQL for cross-engine verification.
    Rankings are unaffected (per-round normalization is a positive
    scalar).  Scores are decimal(38,0)-summed; magnitudes grow like
    (d_max)^(2·iterations), so the overflow guard raises loudly before
    any silent wrap — rescale or lower ``iterations`` if it fires.

    Output: (node, hub, authority) for every vertex of the graph.
    Dangling direction conventions: a node with no out-edges has hub 0
    after round 1; no in-edges ⇒ authority 0.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src).alias("__s__"), F.col(dst).alias("__d__")).distinct()
    nodes = (
        e.select(F.col("__s__").alias("node"))
        .unionByName(e.select(F.col("__d__").alias("node")))
        .distinct()
    )
    hub = nodes.select("node", F.lit(1).cast("decimal(38,0)").alias("hub"))
    auth = None
    for i in range(iterations):
        auth = (
            e.join(hub, F.col("__s__") == F.col("node"))
            .groupBy(F.col("__d__").alias("node"))
            .agg(F.sum("hub").alias("authority"))
        )
        auth = nodes.join(auth, "node", "left").select(
            "node",
            F.coalesce("authority", F.lit(0).cast("decimal(38,0)")).alias(
                "authority"
            ),
        )
        hub = (
            e.join(auth, F.col("__d__") == F.col("node"))
            .groupBy(F.col("__s__").alias("node"))
            .agg(F.sum("authority").alias("hub"))
        )
        hub = nodes.join(hub, "node", "left").select(
            "node",
            F.coalesce("hub", F.lit(0).cast("decimal(38,0)")).alias("hub"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            hub = hub.localCheckpoint(eager=True)
            auth = auth.localCheckpoint(eager=True)
    out = nodes.join(hub, "node", "left").join(auth, "node", "left").select(
        "node",
        F.col("hub").cast("bigint").alias("hub"),
        F.col("authority").cast("bigint").alias("authority"),
    )
    return out


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity of an UNDIRECTED graph (Newman PRL'02): the
    Pearson correlation of the (deg(u), deg(v)) pairs over edge
    endpoints, both orientations.  Positive ⇒ hubs attach to hubs
    (social nets); negative ⇒ hub-and-spoke (co-purchase, web).

    One degree aggregate, two broadcast-sized joins back onto the edge
    list, then the ``grouped_corr`` exact-integer Pearson contract:
    every sum (Σx, Σy, Σxy, Σx², Σy², n) is an exact int64/decimal sum
    of integer degrees, so r is a FIXED IEEE chain over exactly-agreed
    integers — bit-portable across engines.  Output one row:
    (n_edge_ends, r_num, r_den_x, r_den_y, assortativity).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        # feeds both union arms of `both`, which itself feeds the degree
        # aggregate and both endpoint joins: materialize the 16-bytes/row
        # canonical edge set once (12 inlined upstream scans otherwise)
        .localCheckpoint(eager=True)
    )
    both = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = both.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    pairs = (
        both.join(deg.select(F.col("a"), F.col("deg").alias("dx")), "a")
        .join(
            deg.select(F.col("a").alias("b"), F.col("deg").alias("dy")), "b"
        )
        .select("dx", "dy")
    )
    s = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    denx = n * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    deny = n * F.col("syy").cast("double") - F.col("sy").cast(
        "double"
    ) * F.col("sy").cast("double")
    return s.select(
        F.col("n").alias("n_edge_ends"),
        num.alias("r_num"),
        denx.alias("r_den_x"),
        deny.alias("r_den_y"),
        F.when(
            (denx > 0.0) & (deny > 0.0), num / F.sqrt(denx * deny)
        ).alias("assortativity"),
    )
