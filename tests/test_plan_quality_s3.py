"""Physical-plan gates for the round-10 session-3 claims: shuffle
counts, no cartesian products, no Python stages, and the
broadcast-scalar-only BNLJ contract."""

import pytest

QUERIES_AND_BOUNDS = {
    # name: (max hash exchanges, notes)
    "moments_events": 1,  # ONE partial-combined aggregate
    "ranking_metrics_events": 1,  # windows + agg share the query key
    "woe_iv_orders": 1,  # one contingency aggregate
    "mixture_temperature_docs": 1,  # one per-source aggregate
    "cuped_orders": 2,  # per-unit agg + per-arm agg
    "token_entropy_docs": 2,  # (doc, token) counts + per-doc agg
}


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    from pangool_spark.queries import QUERIES

    out = {}
    names = set(QUERIES_AND_BOUNDS) | {
        "mutual_info_events",
        "unigram_kl_docs",
        "zipf_fit_docs",
        "histogram_quantiles_lineitem",
        "raking_customers",
        "scd2_apply_events",
        "feature_mi_orders",
    }
    for name in names:
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
    # the catalog-wide contract: nested-loop joins are acceptable only
    # when one side is a broadcast of an aggregate/tiny literal relation
    for name, plan in plans.items():
        if "BroadcastNestedLoopJoin" in plan:
            assert "BroadcastExchange" in plan, name
