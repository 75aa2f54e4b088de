"""Snapshot maintenance: upsert merges, latest-version dedup, SCD2
historization.

The reference's users ran these constantly as reduce-side join jobs —
"apply today's delta to the master file" is THE canonical MapReduce
pattern (a Pangool ``TupleMRBuilder`` with two inputs grouped on the key;
cf. the url-resolution example's dimension+fact shape,
``P/examples/.../urlresolution``). Spark-first restatement: anti-join +
union for the merge, WindowGroupLimit for latest-version, lead() for
validity intervals.

Scale notes baked into each operator:

- ``merge_upsert`` shuffles the base ONCE on the key (the anti-join);
  with base and delta both bucketed by the key (``write_bucketed``) the
  exchange disappears entirely — the daily 100 TB snapshot job is then
  scan + zipped bucket join + write.
- ``keep_latest`` is a rank-1 window: Spark pushes the ``rn = 1``
  predicate into WindowGroupLimit, so tasks keep one row per key and the
  version history never materializes per group.
- ``scd2_history`` is one window pass (lead) over the change log — no
  self-join, no per-key state beyond the sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Apply a delta to a snapshot: rows in ``updates`` REPLACE base rows
    sharing their key; keys absent from the base are inserts; base rows
    not touched carry forward. Column sets must match (checked) — this is
    whole-row replacement, the semantics of a daily master-file rebuild.

    One shuffle of the base (anti-join on the key) + a union; the delta
    side is usually tiny and broadcasts. Multi-version deltas: run
    ``keep_latest`` on the delta first, or every version of a key lands
    in the output.
    """
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            f"merge_upsert needs matching columns; base has "
            f"{sorted(set(base.columns) - set(updates.columns))} extra, updates "
            f"{sorted(set(updates.columns) - set(base.columns))}"
        )
    keys = list(keys)
    touched = updates.select(keys).distinct()
    kept = base.join(touched, keys, "left_anti")
    return kept.unionByName(updates.select(base.columns))


def keep_latest(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """Latest version per key from a multi-version log (CDC stream dumps,
    re-crawled documents, event snapshots): the row with the greatest
    ``order_by`` tuple wins; ties must be broken by the caller's last
    order column (make it unique, e.g. an event id) to keep the winner
    deterministic.

    rank-1 window → WindowGroupLimit: tasks keep one candidate row per
    key, full version histories never sit in memory.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) historization of a change log:
    one row per (key, version) with ``valid_from``/``valid_to`` interval
    columns and ``is_current``. ``valid_to`` is the next version's
    ``valid_from`` (half-open intervals, the join-friendly convention);
    the newest version is open-ended (NULL) and flagged current.

    One window pass (lead over the per-key timestamp order) — no
    self-join; at 100 TB this is a single shuffle on the key. Rows that
    repeat the previous attribute values are kept as distinct versions
    (collapse duplicates upstream if the log re-emits unchanged state).
    (keys, ts) must be unique — ties make the lead() interval chain
    ambiguous; collapse them first with ``keep_latest(df, keys + [ts_col],
    [...])`` as the ``scd2_user_type_history`` query does.
    """
    from pyspark.sql import Window

    keys = list(keys)
    attrs = list(attr_cols) if attr_cols is not None else [
        c for c in df.columns if c not in keys and c != ts_col
    ]
    w = Window.partitionBy(*keys).orderBy(F.col("valid_from").asc())
    out = df.select(
        *keys, *attrs, F.col(ts_col).alias("valid_from")
    ).withColumn("valid_to", F.lead("valid_from").over(w))
    return out.withColumn("is_current", F.col("valid_to").isNull())


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Keyed diff of two snapshots — the review step before a
    ``merge_upsert`` ships, and the drill-down behind
    ``profile.dataset_checksum`` when the cheap fingerprint says two runs
    diverged: WHICH keys were added / removed / changed?

    Output: one row per differing key → (*keys, status) with status in
    {'added', 'removed', 'changed'}; identical rows are omitted (the
    common case at 100 TB — a daily diff is delta-sized, never
    snapshot-sized). ``compare_cols`` limits change detection to named
    columns (default: every shared non-key column). Comparison is
    null-safe per column (NULL == NULL for diff purposes, matching SQL's
    IS NOT DISTINCT FROM), via one struct<=>struct equality.

    Scale shape: a single full outer shuffle join on the keys — with
    both snapshots bucketed by the keys, zero exchanges, same as
    ``merge_upsert``. No collect, no window.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("dataset_diff needs at least one key column")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    compare_cols = list(compare_cols)

    o = old.select(
        *keys,
        F.lit(True).alias("__in_old__"),
        F.struct(*[F.col(c) for c in compare_cols]).alias("__old_vals__"),
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__in_new__"),
        F.struct(*[F.col(c) for c in compare_cols]).alias("__new_vals__"),
    )
    joined = o.join(n, keys, "full_outer")
    changed = (
        F.col("__in_old__").isNotNull()
        & F.col("__in_new__").isNotNull()
        & ~F.col("__old_vals__").eqNullSafe(F.col("__new_vals__"))
        if compare_cols
        else F.lit(False)
    )
    status = (
        F.when(F.col("__in_old__").isNull(), F.lit("added"))
        .when(F.col("__in_new__").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*keys, "status")
    )


def point_in_time_join(
    probe: DataFrame,
    history: DataFrame,
    keys: Sequence[str],
    probe_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    attr_cols: Sequence[str] | None = None,
    prefix: str = "pit_",
    allow_exact: bool = True,
) -> DataFrame:
    """Point-in-time lookup over an SCD2 history (``scd2_history``
    output): attach to every probe row the version whose
    ``[valid_from, valid_to)`` interval contains the probe timestamp —
    the feature-store join that keeps training data leakage-free (a
    label row must see yesterday's feature value, never tomorrow's).

    One as-of join on ``valid_from`` (the one-exchange union-sort-last
    plan — never a per-probe interval scan), then a validity guard:
    with a CONTIGUOUS history the latest-start version automatically
    contains the probe ts, but a gapped history (deleted periods,
    retention cuts) can as-of-match a version that already EXPIRED —
    those attach NULLs instead of stale values. Probe rows are always
    kept (left semantics). Output: probe columns + ``prefix``-ed attr
    and validity columns.
    """
    ks = list(keys)
    attrs = list(attr_cols) if attr_cols is not None else [
        c for c in history.columns
        if c not in (*ks, valid_from, valid_to, "is_current")
    ]
    if not attrs:
        raise ValueError("point_in_time_join: no attribute columns to attach")
    from pangool_spark.operators.joins import asof_join

    h = history.select(
        *ks,
        F.col(valid_from).alias(probe_ts),
        F.col(valid_to).alias("__vto__"),
        *attrs,
    )
    j = asof_join(
        probe,
        h,
        on=ks,
        ts_col=probe_ts,
        right_cols=[*attrs, "__vto__"],
        prefix=prefix,
        allow_exact=allow_exact,
    )
    vto = F.col(f"{prefix}__vto__")
    ok = vto.isNull() | (F.col(probe_ts) < vto)
    out_cols = [
        F.when(ok, F.col(f"{prefix}{c}")).alias(f"{prefix}{c}") for c in attrs
    ]
    # The matched interval rides along (same expired-version guard), so
    # callers can audit WHICH version supplied the features: valid_from is
    # the as-of-matched start (the right side's probe_ts-aliased column is
    # consumed by asof_join, so re-derive nothing — expose the guard pair).
    validity_cols = [
        F.when(ok, F.col(f"{prefix}{probe_ts}")).alias(f"{prefix}{valid_from}"),
        F.when(ok, vto).alias(f"{prefix}{valid_to}"),
    ]
    return j.select(*probe.columns, *out_cols, *validity_cols)


def _cols(spec) -> "list[str]":
    return [spec] if isinstance(spec, str) else list(spec)


def _eq(left: DataFrame, right: DataFrame, lcols, rcols):
    conds = [left[a] == right[b] for a, b in zip(lcols, rcols)]
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def cascade_delete(
    tables: "dict[str, tuple[DataFrame, object]]",
    seed_table: str,
    seed_keys: DataFrame,
    fk_edges: Sequence[tuple[str, str, object]],
) -> "tuple[dict[str, DataFrame], DataFrame]":
    """Right-to-be-forgotten propagation: delete the ``seed_keys`` rows
    of ``seed_table`` and cascade through the foreign-key graph — each
    ``fk_edges`` entry ``(parent, child, child_fk)`` marks child rows
    whose ``child_fk`` column(s) reference a deleted parent primary key
    as deleted too, transitively. The GDPR/CCPA erasure job every
    lakehouse runs against fact tables hanging off the user dimension.

    ``tables`` maps name → (DataFrame, deletion key — a column or list
    for composite keys, e.g. lineitem's (orderkey, linenumber)). The
    key sets the deletion GRANULARITY and need not be unique: every row
    sharing a doomed key dies together, and the report counts rows, not
    key tuples. Deletion state lives as per-table KEY relations, so
    every shuffle moves keys, never rows — each edge is one semi-join
    projected to the child's key (AQE broadcasts small key sets, the
    common case), each surviving table one anti-join on its own key.
    Nothing is collected; survivors and the report are lazy plans
    composing into the caller's overwrite job. NULL foreign keys match
    no parent (SQL semantics) and survive.

    ``fk_edges`` must be topologically ordered (FK graphs are DAGs;
    every parent's incoming deletions before its onward edges). Raises
    on unknown tables or an edge whose parent has no deletion set yet —
    a mis-ordered DAG would silently delete nothing downstream.

    Returns ``(survivors, report)``: per-table surviving DataFrames and
    the lazy (table_name, n_deleted, n_kept) report relation.
    """
    if seed_table not in tables:
        raise ValueError(f"unknown seed table {seed_table!r}")
    doomed: dict[str, DataFrame] = {}
    df0, pk0 = tables[seed_table]
    pk0 = _cols(pk0)
    doomed[seed_table] = (
        df0.join(
            seed_keys, _eq(df0, seed_keys, pk0, seed_keys.columns), "left_semi"
        )
        .select(*pk0)
        .distinct()
    )
    for parent, child, child_fk in fk_edges:
        for t in (parent, child):
            if t not in tables:
                raise ValueError(f"unknown table {t!r} in fk_edges")
        if parent not in doomed:
            raise ValueError(
                f"edge ({parent} -> {child}) before any deletion reached "
                f"{parent!r} — fk_edges must be topologically ordered"
            )
        cdf, cpk = tables[child]
        cpk = _cols(cpk)
        fk = _cols(child_fk)
        pkeys = doomed[parent]
        if len(fk) != len(pkeys.columns):
            raise ValueError(
                f"edge ({parent} -> {child}): fk {fk} arity does not match "
                f"parent key {pkeys.columns}"
            )
        hit = (
            cdf.join(pkeys, _eq(cdf, pkeys, fk, pkeys.columns), "left_semi")
            .select(*cpk)
            .distinct()
        )
        doomed[child] = (
            doomed[child].unionByName(hit).distinct()
            if child in doomed
            else hit
        )
    survivors: dict[str, DataFrame] = {}
    report = None
    for name, (df, pk) in tables.items():
        pk = _cols(pk)
        keys = doomed.get(name)
        if keys is None:
            survivors[name] = df
            row = df.agg(
                F.lit(name).alias("table_name"),
                F.lit(0).cast("bigint").alias("n_deleted"),
                F.count(F.lit(1)).alias("n_kept"),
            )
        else:
            survivors[name] = df.join(
                keys, _eq(df, keys, pk, keys.columns), "left_anti"
            )
            total = df.agg(F.count(F.lit(1)).alias("__total__"))
            # count deleted ROWS (semi-join), not key tuples: deletion
            # keys need not be unique — every row sharing a doomed key
            # dies, and the report must say how many rows that was
            ndel = df.join(keys, _eq(df, keys, pk, keys.columns), "left_semi").agg(
                F.count(F.lit(1)).alias("__del__")
            )
            row = total.crossJoin(ndel).select(
                F.lit(name).alias("table_name"),
                F.col("__del__").alias("n_deleted"),
                (F.col("__total__") - F.col("__del__")).alias("n_kept"),
            )
        report = row if report is None else report.unionByName(row)
    return survivors, report


def join_view_delta(
    base_left: DataFrame,
    delta_left: DataFrame,
    base_right: DataFrame,
    delta_right: DataFrame,
    left_on,
    right_on,
) -> DataFrame:
    """Incremental maintenance of an inner-join view under INSERT-ONLY
    deltas on both sides — the join analog of ``grouping.agg_state``:
    instead of recomputing (L∪ΔL)⋈(R∪ΔR), emit only the NEW view rows

        ΔV  =  ΔL⋈R  ∪  L⋈ΔR  ∪  ΔL⋈ΔR

    which is exact (not approximate) for inserts: a joined pair is new
    iff at least one of its two rows is new, and the three terms
    partition those pairs by WHICH side is new — so the union needs no
    dedup and multiset semantics are preserved. Updates/deletes go
    through ``merge_upsert``/``cascade_delete`` first; feeding a delta
    that overlaps its base double-counts (caller contract, as with
    ``agg_state`` merges).

    The 100 TB shape: every term is delta-sized on at least one side —
    a daily Δ joining the big base relation broadcasts (or
    runtime-filters, cf. ``joins.bloom_prune_join``) the delta, so the
    maintenance cost is |Δ|·fan-out, never |base|⋈|base|. AQE picks
    broadcast automatically for small deltas; the base relations are
    scanned at most once each.

    Schemas must line up pairwise (base/delta of a side identical).
    Output: joined rows (all left columns then all right columns), the
    same shape a full recompute of the view would produce.
    """
    lcols, rcols = _cols(left_on), _cols(right_on)
    if len(lcols) != len(rcols):
        raise ValueError("left_on and right_on must have the same length")
    if base_left.columns != delta_left.columns:
        raise ValueError("base_left and delta_left schemas differ")
    if base_right.columns != delta_right.columns:
        raise ValueError("base_right and delta_right schemas differ")
    overlap = set(base_left.columns) & set(base_right.columns)
    if overlap:
        raise ValueError(f"join sides share column names: {sorted(overlap)}")

    def term(lf: DataFrame, rf: DataFrame) -> DataFrame:
        return lf.join(rf, _eq(lf, rf, lcols, rcols), "inner").select(
            *[lf[c] for c in lf.columns], *[rf[c] for c in rf.columns]
        )

    return (
        term(delta_left, base_right)
        .unionByName(term(base_left, delta_right))
        .unionByName(term(delta_left, delta_right))
    )


def golden_record(
    df: DataFrame,
    cluster_col: str,
    fields: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """SURVIVORSHIP merge — the golden-record step after entity
    resolution (``er_clusters``): within each cluster, every field is
    taken INDEPENDENTLY from the highest-priority row where that field
    is non-null, so the merged record can be better than any single
    member (name from the freshest crawl, phone from the verified one).
    Priority = the ``order_by`` tuple, LARGER wins (orient columns
    upstream: negate for ascending, use -age for recency); it must be a
    total order with non-null values for a deterministic winner — the
    field value itself is the final tie-break.

    One partial-combined aggregate: each field is a guarded struct-max
    ``max(when(field not null, struct(order…, field)))`` — per-field
    winners without per-field joins, windows, or a second pass; NULL
    fields simply never compete. Output: one row per cluster —
    (cluster_col, n_members, *fields); clusters where every member has
    NULL for a field emit NULL there.
    """
    if not fields:
        raise ValueError("fields must be non-empty")
    if not order_by:
        raise ValueError("order_by must be non-empty (survivorship needs "
                         "a priority order)")
    aggs = [F.count(F.lit(1)).alias("n_members")]
    for f in fields:
        st = F.struct(
            *[F.col(c) for c in order_by], F.col(f).alias("__val__")
        )
        aggs.append(
            F.max(F.when(F.col(f).isNotNull(), st)).alias(f"__w_{f}__")
        )
    g = df.groupBy(cluster_col).agg(*aggs)
    return g.select(
        cluster_col,
        "n_members",
        *[F.col(f"__w_{f}__")["__val__"].alias(f) for f in fields],
    )


def pseudonymize(
    df: DataFrame,
    cols: Sequence[str],
    salt: str,
    token_len: int = 16,
) -> DataFrame:
    """Salted deterministic pseudonymization of identifier columns — the
    GDPR-pipeline companion to ``cascade_delete``: replace each value
    with a keyed token md5(salt ‖ ':' ‖ value) so analytics keep working
    (same value → same token, so joins, group-bys, and COUNT DISTINCT
    across TABLES survive as long as every table is tokenized with the
    SAME salt) while raw identifiers never leave the cluster. Rotating
    the salt severs all linkage to previously released datasets — the
    unlinkability lever reversible masking doesn't have.

    NULLs stay NULL (no token for "unknown"). Values are canonicalized
    through their string form, so 42 (int) and '42' (string) tokenize
    identically — a cross-table FK tokenized from a bigint child and a
    string parent still joins. Zero shuffles, zero UDFs: one md5
    projection per column, map-only at any scale.

    Output: the input with each ``cols`` column replaced by a
    ``token_len``-hex-char string (same name, string type).
    """
    if not cols:
        raise ValueError("pseudonymize needs at least one column")
    if not salt:
        raise ValueError(
            "pseudonymize needs a non-empty salt — an unsalted hash of a "
            "low-cardinality identifier is reversible by enumeration"
        )
    if not 4 <= token_len <= 32:
        raise ValueError(f"token_len must be in [4, 32], got {token_len}")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"pseudonymize: columns not in input: {missing}")
    out = df
    for c in cols:
        tok = F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(c).cast("string"))),
            1,
            token_len,
        )
        out = out.withColumn(c, F.when(F.col(c).isNotNull(), tok))
    return out


def scd2_apply(
    history: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    validate: bool = True,
) -> DataFrame:
    """Incremental SCD2 maintenance: fold a CDC change-log batch into a
    standing ``scd2_history`` relation WITHOUT rebuilding it — closed
    versions are never touched, untouched keys pass through, and only
    the affected keys' current rows re-chain against the batch. The
    nightly-dimension-merge shape: O(|current ∩ batch keys| + |batch|),
    not O(full history log).

    Exact-equivalence contract (the oracle): for any split of a change
    log into (past, batch),
    ``scd2_apply(scd2_history(past), batch) == scd2_history(past ∪
    batch)`` row-for-row — because re-historizing each affected key's
    open version together with its batch rows rebuilds exactly the
    tail of the full chain. That requires batch timestamps strictly
    AFTER the affected key's current ``valid_from`` (late-arriving
    rows would belong inside already-closed versions); with
    ``validate=True`` (default) a violation count runs as one
    aggregate and raises instead of silently mis-chaining. Batch rows
    must be unique per (keys, ts) — collapse with ``keep_latest``
    upstream, as ``scd2_history`` itself requires.

    Output: the ``scd2_history`` schema (keys + attrs + valid_from,
    valid_to, is_current).
    """
    keys = list(keys)
    attrs = list(attr_cols)
    closed = history.filter(~F.col("is_current"))
    current = history.filter(F.col("is_current"))
    bkeys = batch.select(*keys).distinct()
    untouched = current.join(bkeys, keys, "left_anti")
    affected = current.join(bkeys, keys, "left_semi")
    if validate:
        n_bad = (
            affected.select(*keys, "valid_from")
            .join(batch.select(*keys, F.col(ts_col).alias("__bts__")), keys)
            .filter(F.col("__bts__") <= F.col("valid_from"))
            .count()
        )
        if n_bad:
            raise ValueError(
                f"scd2_apply: {n_bad} batch row(s) at or before an "
                f"affected key's current valid_from — late-arriving "
                f"changes need a rebuild of those keys, not an append"
            )
    minilog = affected.select(
        *keys, *attrs, F.col("valid_from").alias(ts_col)
    ).unionByName(batch.select(*keys, *attrs, ts_col))
    rebuilt = scd2_history(minilog, keys, ts_col, attrs)
    cols = [*keys, *attrs, "valid_from", "valid_to", "is_current"]
    return (
        closed.select(*cols)
        .unionByName(untouched.select(*cols))
        .unionByName(rebuilt.select(*cols))
    )
