"""Cross-engine property sweep for the kmeans_lloyd oracle: the SAME
generated unrolled-CTE SQL the catalog query ships, executed by DuckDB
over RANDOM vectors, must hash-match Spark's operator bit-for-bit —
the fixture data alone cannot stress init ties, empty clusters, or the
distance-chain rounding across magnitudes."""

import random

import duckdb
import pytest


@pytest.mark.parametrize("seed,n,dim,k", [(3, 40, 6, 3), (11, 25, 4, 5)])
def test_kmeans_oracle_matches_on_random_vectors(spark, seed, n, dim, k):
    from pangool_spark.operators.ml import kmeans_lloyd
    from pangool_spark.queries import _kmeans_oracle_sql

    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-0.6, 0.6) for _ in range(dim)]) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got, _cents = kmeans_lloyd(df, k=k, iterations=2, dim=dim)
    got = {r["vec_id"]: (r["cluster"], r["dist2"]) for r in got.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)", [(i, v) for i, v in rows]
    )
    sql = _kmeans_oracle_sql(k=k, iterations=2, scale=1_000_000, dim=dim)
    want = {
        r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()
    }
    assert got == want  # clusters AND raw dist2 doubles, bit-for-bit


def test_kmeans_oracle_duplicate_seed_vectors(spark):
    """Duplicate points seeding identical centroids: the lowest-index
    tie-break must agree across engines."""
    from pangool_spark.operators.ml import kmeans_lloyd
    from pangool_spark.queries import _kmeans_oracle_sql

    rows = [(i, [0.1, 0.2]) for i in range(4)] + [
        (10, [0.5, -0.3]), (11, [-0.4, 0.4]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got, _ = kmeans_lloyd(df, k=3, iterations=2, dim=2)
    got = {r["vec_id"]: (r["cluster"], r["dist2"]) for r in got.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)", [(i, v) for i, v in rows]
    )
    sql = _kmeans_oracle_sql(k=3, iterations=2, scale=1_000_000, dim=2)
    want = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    assert got == want
