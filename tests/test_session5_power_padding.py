"""Round-10 session-5 final pair: power_analysis and padding_efficiency
— pure-python reference pins plus edge contracts."""

import math

import pytest

_ZSUM2 = (1.959963984540054 + 0.8416212335729143) ** 2


def test_power_analysis_matches_reference(spark):
    from pangool_spark.operators.stats import power_analysis

    vals = [120, 90, 200, 150, 80, 170, 130, 110]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, y bigint"
    )
    got = power_analysis(df, ["g"], "y", rel_mde=0.05).collect()[0]
    n = len(vals)
    mean = sum(vals) / n
    var = (sum(v * v for v in vals) - sum(vals) ** 2 / n) / (n - 1)
    n_req = math.ceil(2.0 * _ZSUM2 * var / ((0.05 * mean) * (0.05 * mean)))
    assert got.n_obs == n
    assert got.mean == pytest.approx(mean, rel=1e-12)
    assert got.variance == pytest.approx(var, rel=1e-12)
    assert got.n_required == n_req


def test_power_analysis_smaller_mde_needs_more_units(spark):
    from pangool_spark.operators.stats import power_analysis

    vals = [(i % 7) * 13 + 40 for i in range(50)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, y bigint")
    wide = power_analysis(df, ["g"], "y", rel_mde=0.10).collect()[0]
    narrow = power_analysis(df, ["g"], "y", rel_mde=0.01).collect()[0]
    assert narrow.n_required > wide.n_required
    # quadratic: 10x tighter MDE needs ~100x units (ceil rounding aside)
    assert narrow.n_required >= 90 * wide.n_required


def test_power_analysis_degenerate_and_validation(spark):
    from pangool_spark.operators.stats import power_analysis

    df = spark.createDataFrame(
        [("const", 5), ("const", 5), ("single", 7)], "g string, y bigint"
    )
    got = {r.g: r for r in power_analysis(df, ["g"], "y").collect()}
    assert got["const"].variance == 0.0 and got["const"].n_required is None
    assert got["single"].variance is None and got["single"].n_required is None
    with pytest.raises(ValueError, match="rel_mde"):
        power_analysis(df, ["g"], "y", rel_mde=0.0)
    with pytest.raises(ValueError, match="integer-typed"):
        power_analysis(
            spark.createDataFrame([("g", 1.0)], "g string, y double"),
            ["g"],
            "y",
        )


def test_padding_efficiency_matches_reference(spark):
    from pangool_spark.operators.text import padding_efficiency

    # lengths: 3 and 60 -> bucket 64; 100 -> 128; 2000, 1500 -> overflow
    docs = [
        "a b c",
        " ".join(["t"] * 60),
        " ".join(["t"] * 100),
        " ".join(["t"] * 2000),
        " ".join(["t"] * 1500),
    ]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    got = {r.bucket_edge: r for r in padding_efficiency(df).collect()}
    assert set(got) == {64, 128, 2000}
    b64 = got[64]
    assert (b64.n_docs, b64.tokens, b64.capacity) == (2, 63, 128)
    assert b64.waste == 65
    assert b64.efficiency == pytest.approx(63 / 128)
    ovf = got[2000]  # overflow pads to its own max length
    assert (ovf.n_docs, ovf.tokens, ovf.capacity) == (2, 3500, 4000)
    total_t, total_c = 63 + 100 + 3500, 128 + 128 + 4000
    for r in got.values():
        assert r.overall_efficiency == pytest.approx(total_t / total_c)


def test_padding_efficiency_empty_docs_and_validation(spark):
    from pangool_spark.operators.text import padding_efficiency

    df = spark.createDataFrame([("",), ("x",)], "text string")
    got = padding_efficiency(df).collect()
    assert len(got) == 1
    assert got[0].bucket_edge == 64 and got[0].tokens == 1
    with pytest.raises(ValueError, match="strictly increasing"):
        padding_efficiency(df, bucket_edges=(64, 64))
