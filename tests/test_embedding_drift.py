"""embedding_drift: exact-grid centroid shift between dataset versions."""

import pytest


def test_drift_zero_for_identical_sides(spark):
    from pangool_spark.operators.ml import embedding_drift

    rows = [(i, [0.1 * i, 0.5], 0) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>, label INT")
    [r] = embedding_drift(df, df, dim=2, scale=1000).collect()
    assert r["shift"] == pytest.approx(0.0)
    assert r["n_a"] == r["n_b"] == 6


def test_drift_known_translation(spark):
    from pangool_spark.operators.ml import embedding_drift

    # side B = side A translated by (+0.5, 0): centroid shift = 0.5 on
    # the 1/1000 grid (0.5*1000 = 500 grid steps, exactly representable)
    a_rows = [(i, [float(i), 2.0], 0) for i in range(4)]
    b_rows = [(i, [float(i) + 0.5, 2.0], 0) for i in range(4)]
    a = spark.createDataFrame(a_rows, "vec_id LONG, embedding ARRAY<DOUBLE>, label INT")
    b = spark.createDataFrame(b_rows, "vec_id LONG, embedding ARRAY<DOUBLE>, label INT")
    [r] = embedding_drift(a, b, dim=2, scale=1000).collect()
    assert r["shift"] == pytest.approx(0.5, rel=1e-12)


def test_drift_matches_numpy_centroids(spark):
    import numpy as np

    from pangool_spark.operators.ml import embedding_drift

    rng = np.random.RandomState(6)
    va = rng.randn(30, 8)
    vb = rng.randn(20, 8)
    mk = lambda vs, lab: [(i, [float(x) for x in v], lab) for i, v in enumerate(vs)]
    a = spark.createDataFrame(mk(va, 1), "vec_id LONG, embedding ARRAY<DOUBLE>, label INT")
    b = spark.createDataFrame(mk(vb, 1), "vec_id LONG, embedding ARRAY<DOUBLE>, label INT")
    [r] = embedding_drift(a, b, dim=8, scale=1000).collect()
    qa = np.floor(va * 1000)
    qb = np.floor(vb * 1000)
    expected = np.linalg.norm(qa.mean(axis=0) - qb.mean(axis=0)) / 1000
    assert r["shift"] == pytest.approx(expected, rel=1e-12)


def test_drift_one_sided_label_absent_and_wrong_dim_dropped(spark):
    from pangool_spark.operators.ml import embedding_drift

    a = spark.createDataFrame(
        [(1, [1.0, 1.0], 0), (2, [0.0, 0.0], 9), (3, [1.0], 0)],
        "vec_id LONG, embedding ARRAY<DOUBLE>, label INT",
    )
    b = spark.createDataFrame(
        [(4, [1.0, 1.0], 0)], "vec_id LONG, embedding ARRAY<DOUBLE>, label INT"
    )
    rows = embedding_drift(a, b, dim=2, scale=1000).collect()
    assert {r["label"] for r in rows} == {0}  # label 9 one-sided; id 3 wrong dim
    assert rows[0]["n_a"] == 1
