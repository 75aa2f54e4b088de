"""Persisted IVF index lifecycle: build/reload/append/search == the
in-flight ivf_topk over the same corpus+centroids; auto cell sizing."""

import pytest
from pyspark.sql import functions as F

CENTROIDS = [[1.0 if j % 4 == i else 0.25 for j in range(8)] for i in range(4)]


def _vecs(spark, ids):
    rows = [(i, [float((i * 7 + j * 3) % 5) + (1.0 if j % 4 == i % 4 else 0.0)
                 for j in range(8)]) for i in ids]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def test_lifecycle_equals_inflight(spark, tmp_path):
    from pangool_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
        load_ivf_centroids,
    )

    base = _vecs(spark, range(0, 40))
    batch = _vecs(spark, range(40, 60))
    full = base.unionByName(batch)
    path = str(tmp_path / "ivf")

    got_cents = build_ivf_index(base, path, centroids=CENTROIDS)
    assert got_cents == CENTROIDS
    assert load_ivf_centroids(spark, path) == CENTROIDS
    append_ivf_index(batch, path)

    queries = full.filter(F.col("vec_id") < 5)
    want = {(r.query_id, r.rank): r.neighbor_id
            for r in ivf_topk(full, queries, CENTROIDS, k=3, n_probe=2).collect()}
    got = {(r.query_id, r.rank): r.neighbor_id
           for r in ivf_topk_indexed(spark, path, queries, k=3,
                                     n_probe=2).collect()}
    assert got == want
    # the append is LIVE: ingested vectors appear as neighbors
    assert any(n >= 40 for n in got.values())


def test_build_refuses_overwrite(spark, tmp_path):
    from pangool_spark.operators.similarity import build_ivf_index

    path = str(tmp_path / "ivf")
    build_ivf_index(_vecs(spark, range(10)), path, centroids=CENTROIDS)
    with pytest.raises(Exception):  # standing index is never clobbered
        build_ivf_index(_vecs(spark, range(10)), path, centroids=CENTROIDS)


def test_auto_cells_schedule():
    from pangool_spark.operators.similarity import ivf_auto_cells

    assert ivf_auto_cells(1, 1024) == 1
    assert ivf_auto_cells(1024, 1024) == 1
    assert ivf_auto_cells(1024 * 64 * 64, 1024) == 64  # √(n/budget)
    assert ivf_auto_cells(5_000_000, 1220) == 64       # the SCALE.md point
    with pytest.raises(ValueError):
        ivf_auto_cells(0)
    with pytest.raises(ValueError):
        ivf_auto_cells(10, 0)


def test_ivf_topk_fits_centroids_when_none(spark):
    from pangool_spark.operators.similarity import ivf_topk

    corpus = _vecs(spark, range(0, 60))
    queries = corpus.filter(F.col("vec_id") < 3)
    out = ivf_topk(corpus, queries, None, k=3, n_probe=1, cell_budget=16)
    rows = out.collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    assert all(1 <= r.rank <= 3 for r in rows)
