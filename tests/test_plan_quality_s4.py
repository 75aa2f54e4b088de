"""Physical-plan gates for the round-10 session-4 claims: shuffle
budgets, no cartesian products beyond broadcast-scalar BNLJ, and no
Python stages in any of the new queries."""

import pytest

QUERIES_AND_BOUNDS = {
    # name: max hash exchanges
    # two register aggregates (p=6, p=10) + the exact-distinct agg;
    # per-estimate finals are single-partition aggs, not hash exchanges
    "hll_distinct_lineitem": 3,
    # cells + (classes / domain / total are aggregates OF cells) + the
    # null-safe grid regroup
    "t_closeness_customers": 5,
    "did_events": 1,  # ONE partial-combined (treated, post) aggregate
    "smd_balance_events": 1,  # ONE melt + per-covariate aggregate
    # bin histogram + candidate-bin local rank + final bucket count;
    # every exchange is aggregate-sized
    "range_bounds_lineitem": 4,
    # two bin aggregates; the joint window runs on the |bins| relation
    "psi_drift_orders": 3,
    # first-event + first-purchase aggregates + the per-duration regroup
    "nelson_aalen_events": 4,
    # one global aggregate + one |bins| aggregate
    "brier_events": 2,
    # cut refinement (2 aggregate exchanges) + final bucket aggregate
    "uplift_deciles_events": 5,
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


def test_smd_did_single_scan_each(plans):
    """The experimentation aggregates must not rescan events per arm:
    conditional aggregation, one scan (two for the SMD melt's stack —
    still one per covariate relation, not one per (covariate, arm))."""
    assert plans["did_events"].count("Scan parquet") == 1
    assert plans["smd_balance_events"].count("Scan parquet") <= 2
