"""grouped_moments vs a pure-Python moment computation, degenerate-group
guards, and the quantized-log Zipf fit on a synthetic power law."""

import math
import random

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators.stats import grouped_linreg, grouped_moments


def _ref_moments(xs):
    n = len(xs)
    mu = sum(xs) / n
    m2 = sum((x - mu) ** 2 for x in xs) / n
    m3 = sum((x - mu) ** 3 for x in xs) / n
    m4 = sum((x - mu) ** 4 for x in xs) / n
    return mu, m2, m3 / (m2 * math.sqrt(m2)), m4 / (m2 * m2) - 3.0


def test_grouped_moments_matches_python_reference(spark):
    rng = random.Random(19)
    rows, groups = [], {}
    for g in range(3):
        # asymmetric integer distribution so skew/kurt are non-trivial
        xs = [rng.randint(0, 100) ** 2 for _ in range(400 + g)]
        groups[g] = xs
        rows += [(g, x) for x in xs]
    rows.append((0, None))  # NULL excluded
    df = spark.createDataFrame(rows, "g int, x bigint")
    got = {r["g"]: r for r in grouped_moments(df, ["g"], "x").collect()}
    for g, xs in groups.items():
        mu, m2, skew, kurt = _ref_moments(xs)
        assert got[g]["n"] == len(xs)
        assert got[g]["mean"] == pytest.approx(mu, rel=1e-12)
        assert got[g]["variance_pop"] == pytest.approx(m2, rel=1e-12)
        assert got[g]["skewness"] == pytest.approx(skew, abs=1e-7)
        assert got[g]["kurtosis_excess"] == pytest.approx(kurt, abs=1e-7)


def test_grouped_moments_degenerate_groups(spark):
    df = spark.createDataFrame(
        [(1, 5), (1, 5), (1, 5), (2, 7)], "g int, x int"
    )
    got = {r["g"]: r for r in grouped_moments(df, ["g"], "x").collect()}
    # zero variance and single row: shape undefined
    assert got[1]["variance_pop"] == 0.0 and got[1]["skewness"] is None
    assert got[2]["n"] == 1 and got[2]["kurtosis_excess"] is None


def test_grouped_moments_rejects_fractional_column(spark):
    df = spark.createDataFrame([(1, 1.5)], "g int, x double")
    with pytest.raises(ValueError):
        grouped_moments(df, ["g"], "x")
    with pytest.raises(ValueError):
        grouped_moments(df, [], "g")


def test_zipf_quantized_fit_recovers_exponent(spark):
    # synthetic exact power law: cnt = round(C / rank^0.8)
    n, alpha, c0 = 300, 0.8, 100_000
    counts = [(f"w{r:04d}", max(1, round(c0 / (r**alpha)))) for r in range(1, n + 1)]
    df = spark.createDataFrame(counts, "word string, cnt bigint")
    quantized = df.select(
        F.lit(1).alias("g"),
        F.round(
            F.log(
                F.row_number()
                .over(
                    __import__("pyspark.sql", fromlist=["Window"]).Window.orderBy(
                        F.desc("cnt"), F.asc("word")
                    )
                )
                .cast("double")
            )
            * 1000.0
        )
        .cast("bigint")
        .alias("x"),
        F.round(F.log(F.col("cnt").cast("double")) * 1000.0)
        .cast("bigint")
        .alias("y"),
    )
    fit = grouped_linreg(quantized, ["g"], "x", "y").collect()[0]
    assert fit["n"] == n
    # slope recovers -alpha within quantization + rounding tolerance
    assert fit["slope"] == pytest.approx(-alpha, abs=0.02)


def test_zipf_fit_docs_catalog_shape(spark, sf_dir):
    from pangool_spark.queries import QUERIES

    row = QUERIES["zipf_fit_docs"](spark, sf_dir).collect()[0]
    assert row["n_types"] > 10
    # natural-ish corpus: negative slope, positive intercept
    assert row["slope"] < 0.0 < row["intercept_nats"]
