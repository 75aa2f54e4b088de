"""Property-based cross-validation of funnel depth against a pure-Python
greedy subsequence matcher on random event streams (random keys, shuffled
timestamps, duplicate steps, irrelevant event types)."""

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st

from pangool_spark.operators.funnel import funnel

STEPS = ["a", "b", "c"]
TYPES = STEPS + ["x", "y"]  # x/y never count


@st.composite
def event_sets(draw):
    n = draw(st.integers(1, 40))
    used_ts = set()
    events = []
    for _ in range(n):
        k = draw(st.integers(0, 4))
        t = draw(st.integers(0, 100))
        if (k, t) in used_ts:  # unique (key, ts): keeps both sides total
            continue
        used_ts.add((k, t))
        events.append((k, t, draw(st.sampled_from(TYPES))))
    return events


def python_funnel(events):
    by_key = {}
    for k, t, e in events:
        if e in STEPS:
            by_key.setdefault(k, []).append((t, STEPS.index(e)))
    out = {}
    for k, evs in by_key.items():
        cursor = 0
        for _, idx in sorted(evs):
            if idx == cursor:
                cursor += 1
        out[k] = cursor
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(event_sets())
def test_funnel_matches_python_reference(spark, events):
    df = spark.createDataFrame(
        events or [(0, 0, "x")], "user_id LONG, ts LONG, event_type STRING"
    )
    expected = python_funnel(events or [(0, 0, "x")])
    # both modes must agree with the greedy reference — stepwise is the
    # bounded-memory default, fold the single-exchange alternative
    for mode in ("stepwise", "fold"):
        got = {
            r.user_id: r.steps_completed
            for r in funnel(df, STEPS, ts_col="ts", mode=mode).collect()
        }
        assert got == expected, mode
