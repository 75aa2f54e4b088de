"""Cross-engine property sweeps for the two r09-window statistics whose
oracles had never been randomized at scale: backtest_seasonal_naive and
target_encode (LOO) — random keys/values through Spark AND DuckDB with
the exact oracle SQL shapes, compared bit-for-bit (the holt/kaplan-meier
sweep discipline, pre-driver-rotation)."""

import random

import duckdb
from pyspark.sql import functions as F


def test_backtest_sweep_spark_equals_duckdb(spark):
    from pangool_spark.operators.stats import backtest_seasonal_naive

    rng = random.Random(0x0909)
    rows = []
    for _ in range(20_000):
        k = rng.randint(0, 12)
        day = rng.randint(0, 120)
        cents = rng.randint(-10_000_000, 10_000_000)
        rows.append((f"t{k}", f"2024-01-01 00:{day // 60:02d}:{day % 60:02d}",
                     day, cents))
    # spread days properly: derive the date from the day offset
    df = spark.createDataFrame(
        rows, "k STRING, junk STRING, day INT, cents LONG"
    ).select(
        "k",
        F.expr("timestamp'2024-01-01 12:00:00' + make_interval(0,0,0,day)")
        .alias("ts"),
        "cents",
    )
    got = {
        (r.k, r.n_days, r.mae, r.bias)
        for r in backtest_seasonal_naive(df, ["k"], "ts", "cents",
                                         season_days=7).collect()
    }
    con = duckdb.connect()
    values = ", ".join(
        f"('{k}', DATE '2024-01-01' + INTERVAL ({day}) DAY, {cents})"
        for k, _junk, day, cents in rows
    )
    sql = f"""
    WITH raw(k, d, cents) AS (VALUES {values}),
    daily AS (
      SELECT k, d, CAST(SUM(cents) AS BIGINT) AS v FROM raw GROUP BY 1, 2
    ),
    joined AS (
      SELECT a.k, a.v - b.v AS err
      FROM daily a JOIN daily b ON a.k = b.k AND a.d = b.d + INTERVAL 7 DAY
    )
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(CAST(SUM(ABS(err)) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mae,
           CAST(CAST(SUM(err) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS bias
    FROM joined GROUP BY 1
    """
    want = set(map(tuple, con.execute(sql).fetchall()))
    assert got == want  # exact-int error sums -> bit-identical doubles


def test_target_encode_loo_sweep_spark_equals_duckdb(spark):
    from pangool_spark.operators.stats import target_encode

    rng = random.Random(0x7E09)
    rows = []
    for i in range(20_000):
        cat = rng.choice([None, "a", "b", "c", "d", "e", "rare"])
        if cat == "rare" and rng.random() > 0.001:
            cat = "a"
        y = rng.randint(-1_000_000, 1_000_000)
        rows.append((i, cat, y))
    df = spark.createDataFrame(rows, "rid LONG, cat STRING, y LONG")
    got = {
        (r.rid, r.te)
        for r in target_encode(df, "cat", "y", prior_weight=20.0,
                               loo=True).select("rid", "te").collect()
    }
    con = duckdb.connect()
    values = ", ".join(
        f"({i}, {'NULL' if c is None else repr(c)}, {y})" for i, c, y in rows
    )
    sql = f"""
    WITH r(rid, cat, y) AS (VALUES {values}),
    g AS (SELECT CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu
          FROM r),
    pc AS (SELECT cat, COUNT(*) AS n, SUM(y) AS s FROM r GROUP BY 1)
    SELECT r.rid,
           (CAST(pc.s - r.y AS DOUBLE) + 20.0::DOUBLE * g.mu)
             / (CAST(pc.n - 1 AS DOUBLE) + 20.0::DOUBLE) AS te
    FROM r JOIN pc ON r.cat IS NOT DISTINCT FROM pc.cat, g
    """
    want = set(map(tuple, con.execute(sql).fetchall()))
    assert got == want  # NULL cats survive the null-safe join on both sides
