"""Iterative pipelines: Game-of-Life parity (EX/gameoflife/GameOfLifeJob.java:
62-109 chains N MapReduce jobs; here iterate() with lineage truncation)."""

from pyspark.sql import functions as F

from pangool_spark.plans import iterate


def life_step(cells, _i):
    # explode the 8 neighbor offsets, count per coordinate, apply B3/S23
    offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    neighbors = cells.select(
        F.explode(
            F.array(*[F.struct((F.col("x") + dx).alias("x"), (F.col("y") + dy).alias("y")) for dx, dy in offsets])
        ).alias("n")
    ).select("n.x", "n.y")
    counts = neighbors.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n_live"))
    survivors = counts.join(cells, ["x", "y"], "left_semi").filter(
        F.col("n_live").isin(2, 3)
    )
    births = counts.join(cells, ["x", "y"], "left_anti").filter(F.col("n_live") == 3)
    return survivors.select("x", "y").unionByName(births.select("x", "y"))


def test_game_of_life_blinker_oscillates(spark):
    blinker = spark.createDataFrame([(0, -1), (0, 0), (0, 1)], "x INT, y INT")
    after1 = iterate(blinker, life_step, 1)
    assert sorted((r.x, r.y) for r in after1.collect()) == [(-1, 0), (0, 0), (1, 0)]
    after2 = iterate(blinker, life_step, 2)
    assert sorted((r.x, r.y) for r in after2.collect()) == [(0, -1), (0, 0), (0, 1)]


def test_iterate_truncates_lineage(spark):
    df = spark.createDataFrame([(1,)], "v INT")
    out = iterate(df, lambda d, i: d.withColumn("v", F.col("v") + 1), 10)
    # localCheckpoint keeps the plan flat: no 10-deep Project chain
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Project") <= 1
    assert out.collect()[0].v == 11


def test_ivf_topk_probes_cells(spark):
    from pangool_spark.operators.similarity import ivf_topk

    rows = [
        (1, [1.0, 0.0]), (2, [0.95, 0.05]), (3, [0.9, 0.1]),
        (4, [0.0, 1.0]), (5, [0.05, 0.95]),
    ]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    queries = emb.filter(F.col("vec_id") == 1)
    out = ivf_topk(emb, queries, [[1.0, 0.0], [0.0, 1.0]], k=2, n_probe=1)
    got = [(r.rank, r.neighbor_id) for r in out.collect()]
    # probing only cell 0 finds the x-axis cluster, never 4/5
    assert sorted(got) == [(1, 2), (2, 3)]
