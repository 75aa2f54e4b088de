"""Physical-plan gates for the round-10 session-5 queries: shuffle
budgets, no cartesian products beyond broadcast-scalar BNLJ, no Python
stages, and the scan-count regressions this session's builds caught
(textrank's per-iteration corpus rescan)."""

import pytest

QUERIES_AND_BOUNDS = {
    # name: max hash exchanges (post-localCheckpoint plans under-count
    # upstream shuffles — the kaplan_meier convention; budgets gate the
    # iterative/window machinery the checkpoint does NOT hide)
    # one contingency aggregate feeds checkpointed cells; marginals +
    # the class regroup are aggregates OF that tiny relation
    "classification_report_events": 3,
    # post-checkpoint: two value-rank windows + two joins + the final
    # aggregate, all over the materialized ≤|cells| relation (the one
    # corpus-sized exchange is the cells aggregate BEHIND the
    # checkpoint — gated by the scan test below)
    "spearman_events": 5,
    # cohort collapses into the checkpointed per-duration relation;
    # downstream is windows + one global aggregate over <=31 rows
    "logrank_events": 1,
    "ipw_ate_events": 1,  # ONE stratum aggregate; windows on |strata|
    "qte_events": 1,  # ONE conditional percentile aggregate
    # daily aggregate (checkpointed) + two lag equi-joins + two finals
    "forecast_accuracy_events": 4,
    "cmh_events": 1,  # ONE per-stratum conditional 2x2 aggregate
    "power_analysis_events": 1,  # ONE moment aggregate per group
    "padding_efficiency_docs": 1,  # ONE bucket aggregate; window on <=6 rows
    # post-checkpoint: disagreement + marginal aggregates over the
    # materialized pairable (unit, value) relation
    "krippendorff_events": 3,
    "eb_rate_parts": 1,  # moment fit + broadcast join over checkpointed keys
    # per-(arm, unit) totals + per-arm power sums: two exchanges
    "ratio_delta_events": 2,
    # pagerank iterations over the CHECKPOINTED vocab-pair edge list:
    # aggregate-sized exchanges only; the corpus itself never rescans
    "textrank_docs": 30,
}


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    from pangool_spark.queries import QUERIES

    out = {}
    for name in QUERIES_AND_BOUNDS:
        df = QUERIES[name](spark, sf_dir)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_shuffle_budgets(plans):
    for name, bound in QUERIES_AND_BOUNDS.items():
        got = plans[name].count("Exchange hashpartitioning")
        assert got <= bound, f"{name}: {got} hash exchanges > budget {bound}"


def test_no_cartesian_and_no_python_stages(plans):
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan, f"{name} has a Python stage ({marker})"


def test_bnlj_only_on_broadcast_scalar_sides(plans):
    for name, plan in plans.items():
        if "BroadcastNestedLoopJoin" in plan:
            assert "BroadcastExchange" in plan, name


def test_textrank_corpus_never_rescans(plans):
    """The session-5 lesson: pagerank's per-iteration joins must derive
    from the checkpointed edge list, not re-inline the pair-stream
    subtree (28 corpus scans before the fix, 0 after)."""
    assert plans["textrank_docs"].count("Scan parquet") == 0


def test_single_scan_aggregate_shapes(plans):
    """The conditional-aggregate shapes must not rescan events per arm;
    spearman's cell checkpoint must hide the corpus from every branch
    (3 corpus aggregates at the 100× probe before the fix, 0 scans
    after — the join-branch inlining lesson)."""
    assert plans["spearman_events"].count("Scan parquet") == 0
    assert plans["ipw_ate_events"].count("Scan parquet") == 1
    assert plans["qte_events"].count("Scan parquet") == 1
    assert plans["cmh_events"].count("Scan parquet") == 1
    assert plans["ratio_delta_events"].count("Scan parquet") == 1
    # checkpointed intermediates: the corpus must not re-derive per branch
    assert plans["krippendorff_events"].count("Scan parquet") == 0
    assert plans["eb_rate_parts"].count("Scan parquet") == 0
    assert plans["power_analysis_events"].count("Scan parquet") == 1
    assert plans["padding_efficiency_docs"].count("Scan parquet") == 1
