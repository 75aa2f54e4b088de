"""Round-9 governance operators: referential_integrity, pseudonymize,
benford_audit, gini_coefficient."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# referential_integrity


def test_ri_counts_orphans_and_nulls(spark):
    from pangool_spark.operators.profile import referential_integrity

    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "fk BIGINT"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk BIGINT")
    [row] = referential_integrity(
        [("c->p", child, ["fk"], parent, ["pk"])]
    ).collect()
    assert row["fk"] == "c->p"
    assert row["n_child"] == 4
    assert row["n_null_keys"] == 1
    assert row["n_orphans"] == 1
    assert row["orphan_rate"] == pytest.approx(1 / 3)


def test_ri_composite_key_null_exempt(spark):
    from pangool_spark.operators.profile import referential_integrity

    child = spark.createDataFrame(
        [(1, 10), (1, None), (2, 20)], "a BIGINT, b BIGINT"
    )
    parent = spark.createDataFrame([(1, 10)], "x BIGINT, y BIGINT")
    [row] = referential_integrity(
        [("comp", child, ["a", "b"], parent, ["x", "y"])]
    ).collect()
    # (1,None) exempt; (2,20) orphan
    assert row["n_null_keys"] == 1 and row["n_orphans"] == 1


def test_ri_multiple_specs_one_relation(spark):
    from pangool_spark.operators.profile import referential_integrity

    c = spark.createDataFrame([(1,)], "k BIGINT")
    p = spark.createDataFrame([(1,)], "k BIGINT")
    out = referential_integrity(
        [("a", c, ["k"], p, ["k"]), ("b", c, ["k"], p, ["k"])]
    )
    assert {r["fk"] for r in out.collect()} == {"a", "b"}
    with pytest.raises(ValueError, match="same-length"):
        referential_integrity([("bad", c, ["k"], p, [])])


# ---------------------------------------------------------------------------
# pseudonymize


def test_pseudonymize_consistent_and_null_safe(spark):
    from pangool_spark.operators.upsert import pseudonymize

    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (None, "z")], "k BIGINT, v STRING"
    )
    out = pseudonymize(df, ["k"], salt="s").collect()
    toks = {r["v"]: r["k"] for r in out}
    assert toks["z"] is None
    assert toks["x"] != toks["y"]
    assert len(toks["x"]) == 16
    # same value tokenized from another table/type joins back
    other = spark.createDataFrame([("1",)], "k STRING")
    [o] = pseudonymize(other, ["k"], salt="s").collect()
    assert o["k"] == toks["x"]
    # different salt severs linkage
    [d] = pseudonymize(other, ["k"], salt="s2").collect()
    assert d["k"] != toks["x"]


def test_pseudonymize_guards(spark):
    from pangool_spark.operators.upsert import pseudonymize

    df = spark.createDataFrame([(1,)], "k BIGINT")
    with pytest.raises(ValueError, match="salt"):
        pseudonymize(df, ["k"], salt="")
    with pytest.raises(ValueError, match="not in input"):
        pseudonymize(df, ["nope"], salt="s")
    with pytest.raises(ValueError, match="token_len"):
        pseudonymize(df, ["k"], salt="s", token_len=64)


# ---------------------------------------------------------------------------
# benford_audit


def test_benford_digits_and_spine(spark):
    from pangool_spark.operators.profile import _BENFORD_P, benford_audit

    # values with leading digits 1,1,2,9; zero and negative excluded
    df = spark.createDataFrame(
        [(100,), (19,), (25,), (9,), (0,), (-5,)], "v BIGINT"
    )
    rows = {r["digit"]: r for r in benford_audit(df, "v").collect()}
    assert set(rows) == set(range(1, 10))  # full spine, absent digits too
    assert rows[1]["n"] == 2 and rows[2]["n"] == 1 and rows[9]["n"] == 1
    assert rows[3]["n"] == 0
    assert rows[1]["n_total"] == 4
    assert rows[1]["observed_p"] == pytest.approx(0.5)
    assert rows[1]["expected_p"] == _BENFORD_P[1]
    assert rows[1]["abs_dev"] == pytest.approx(0.5 - _BENFORD_P[1])


def test_benford_grouped(spark):
    from pangool_spark.operators.profile import benford_audit

    df = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 30)], "g STRING, v BIGINT"
    )
    out = benford_audit(df, "v", group_cols=["g"])
    assert out.count() == 18  # 9 digits x 2 groups
    got = {(r["g"], r["digit"]): r["n"] for r in out.collect()}
    assert got[("a", 1)] == 1 and got[("a", 2)] == 1 and got[("b", 3)] == 1


def test_benford_rejects_fractional(spark):
    from pangool_spark.operators.profile import benford_audit

    df = spark.createDataFrame([(1.5,)], "v DOUBLE")
    with pytest.raises(ValueError, match="integer-typed"):
        benford_audit(df, "v")


# ---------------------------------------------------------------------------
# gini_coefficient


def test_gini_known_values(spark):
    from pangool_spark.operators.profile import gini_coefficient

    # perfect equality -> 0
    eq = spark.createDataFrame([("g", 5)] * 4, "g STRING, v BIGINT")
    [r] = gini_coefficient(eq, ["g"], "v").collect()
    assert r["gini"] == pytest.approx(0.0)
    # total concentration in 1 of n -> (n-1)/n
    conc = spark.createDataFrame(
        [("g", 0), ("g", 0), ("g", 0), ("g", 100)], "g STRING, v BIGINT"
    )
    [r2] = gini_coefficient(conc, ["g"], "v").collect()
    assert r2["gini"] == pytest.approx(3 / 4)
    assert r2["n"] == 4 and r2["total"] == 100


def test_gini_matches_numpy(spark):
    import numpy as np

    from pangool_spark.operators.profile import gini_coefficient

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 1000, size=50)
    df = spark.createDataFrame(
        [("g", int(v)) for v in vals], "g STRING, v BIGINT"
    ).repartition(4)
    [r] = gini_coefficient(df, ["g"], "v").collect()
    x = np.sort(vals.astype(float))
    n = len(x)
    expected = (2 * (np.arange(1, n + 1) * x).sum() - (n + 1) * x.sum()) / (
        n * x.sum()
    )
    assert r["gini"] == pytest.approx(expected, rel=1e-12)


def test_gini_null_values_dropped(spark):
    """Regression (ADVICE r09): value-NULL rows must not inflate n or the
    rank positions."""
    from pangool_spark.operators.profile import gini_coefficient

    with_nulls = spark.createDataFrame(
        [("g", 0), ("g", None), ("g", 0), ("g", None), ("g", 0), ("g", 100)],
        "g STRING, v BIGINT",
    )
    [r] = gini_coefficient(with_nulls, ["g"], "v").collect()
    assert r["n"] == 4 and r["total"] == 100
    assert r["gini"] == pytest.approx(3 / 4)


def test_gini_zero_total_null_and_negative_raises(spark):
    from pangool_spark.operators.profile import gini_coefficient

    zero = spark.createDataFrame([("g", 0), ("g", 0)], "g STRING, v BIGINT")
    [r] = gini_coefficient(zero, ["g"], "v").collect()
    assert r["gini"] is None
    neg = spark.createDataFrame([("g", -1)], "g STRING, v BIGINT")
    with pytest.raises(Exception, match="negative"):
        gini_coefficient(neg, ["g"], "v").collect()
