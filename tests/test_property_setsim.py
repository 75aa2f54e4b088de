"""Property sweep for the setsim prune-threshold boundary class: random
token-set universes at thresholds engineered to land EXACTLY on
integer-ratio Jaccard values (t = i/u), where the r08 half-ulp defect
lived — the measured case was t=0.4, |x|=4, |y|=3, alpha computed
2.0000000000000004 vs true 2.0, silently dropping an at-threshold
pair. Spark pipeline vs Python brute force; small max_examples because
each example is a Spark job."""

import random

import pytest
from pyspark.sql import functions as F  # noqa: F401

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st

from pangool_spark.operators.setsim import jaccard_postings_selfjoin


@st.composite
def corpus_and_threshold(draw):
    rng = random.Random(draw(st.integers(0, 2**31)))
    vocab = [f"w{i}" for i in range(draw(st.integers(8, 20)))]
    rows = [
        (i, rng.sample(vocab, rng.randint(1, min(8, len(vocab)))))
        for i in range(draw(st.integers(10, 25)))
    ]
    # thresholds as exact small-integer ratios — the boundary class:
    # J values are i/u with small ints, so t = i/u makes >= ties common
    num = draw(st.integers(1, 6))
    den = draw(st.integers(num, 12))
    return rows, num / den


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(corpus_and_threshold())
def test_selfjoin_never_drops_boundary_pairs(spark, ct):
    rows, t = ct
    df = spark.createDataFrame(
        [(i, tok) for i, toks in rows for tok in toks], "id LONG, token STRING"
    )
    got = {
        (r.id_a, r.id_b)
        for r in jaccard_postings_selfjoin(df, "id", "token", t).collect()
    }
    want = set()
    for i, a in rows:
        for j, b in rows:
            if i < j:
                sa, sb = set(a), set(b)
                if len(sa & sb) / len(sa | sb) >= t:
                    want.add((i, j))
    assert got == want, f"t={t!r} missing={want - got} extra={got - want}"
