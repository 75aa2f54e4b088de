"""histogram_quantile_sketch: bracket guarantee vs a pure-Python exact
quantile, bin-edge adversarial values, q=1.0, and parameter guards."""

import math
import random

import pytest

from pangool_spark.operators.sketch import histogram_quantile_sketch


def _exact_lower_quantile(xs, q):
    xs = sorted(xs)
    r = math.ceil(q * len(xs))
    return xs[r - 1]


@pytest.mark.parametrize("w", [7, 100])
def test_sketch_brackets_exact(spark, w):
    rng = random.Random(23)
    xs = [rng.randint(0, 5000) for _ in range(4000)]
    # adversarial: pile mass exactly on bin edges
    xs += [w * k for k in range(40)] + [w * k - 1 for k in range(1, 40)]
    df = spark.createDataFrame([(x,) for x in xs], "v bigint")
    got = {
        r["q"]: r
        for r in histogram_quantile_sketch(
            df, "v", bin_width=w, quantiles=(0.1, 0.5, 0.9, 0.99, 1.0)
        ).collect()
    }
    assert len(got) == 5
    for q, r in got.items():
        exact = _exact_lower_quantile(xs, q)
        assert r["est_lo"] <= exact <= r["est_hi"], (q, r, exact)
        assert r["est_hi"] - r["est_lo"] == w - 1
        assert r["n"] == len(xs)


def test_sketch_single_value_and_nulls(spark):
    df = spark.createDataFrame([(42,), (42,), (None,)], "v bigint")
    [r] = histogram_quantile_sketch(
        df, "v", bin_width=10, quantiles=(0.5,)
    ).collect()
    assert r["n"] == 2 and r["est_lo"] <= 42 <= r["est_hi"]


def test_sketch_guards(spark):
    df = spark.createDataFrame([(1,)], "v bigint")
    with pytest.raises(ValueError):
        histogram_quantile_sketch(df, "v", bin_width=0)
    with pytest.raises(ValueError):
        histogram_quantile_sketch(df, "v", bin_width=10, quantiles=(0.0,))
    fdf = spark.createDataFrame([(1.5,)], "v double")
    with pytest.raises(ValueError):
        histogram_quantile_sketch(fdf, "v", bin_width=10)
