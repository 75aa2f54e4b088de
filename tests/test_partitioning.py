"""Skew salting + bucketed co-located joins."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.data import load_table
from pangool_spark.operators.partitioning import (
    cluster_by,
    read_bucketed,
    salted_agg,
    write_bucketed,
)


def test_salted_agg_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {
        r.l_returnflag: (r.n, r.qty, r.mx)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.l_returnflag: (r.n, r.qty, r.mx)
        for r in salted_agg(
            li.withColumn("qdec", F.col("l_quantity").cast("decimal(18,2)")),
            ["l_returnflag"],
            {"n": ("count", "l_quantity"), "qty": ("sum", "qdec"), "mx": ("max", "l_extendedprice")},
            n_salts=8,
        ).collect()
    }
    assert salted == direct


def test_salted_agg_rejects_non_algebraic(spark):
    df = spark.createDataFrame([(1, 2)], "k INT, v INT")
    with pytest.raises(ValueError):
        salted_agg(df, ["k"], {"a": ("avg", "v")})


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    # warehouse dir is a static conf; tables land in ./spark-warehouse.
    # The in-memory catalog forgets tables between sessions but leaves the
    # directories — remove both registration and location.
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o.select("o_orderkey", "o_totalprice"), "b_orders", ["o_orderkey"], 8)
    write_bucketed(
        li.select("l_orderkey", "l_quantity"), "b_lineitem", ["l_orderkey"], 8
    )
    bo = read_bucketed(spark, "b_orders")
    bl = read_bucketed(spark, "b_lineitem")
    joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
    # co-located: the sort-merge join reads both bucketed tables without
    # any shuffle (broadcast must not kick in for the assertion to bite)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "Exchange" not in plan
    assert joined.count() > 0


def test_cluster_by_sorts_within_partitions(spark):
    df = spark.createDataFrame([(2, "b"), (1, "a"), (2, "a"), (1, "b")], "k INT, v STRING")
    out = cluster_by(df, ["k"], n_partitions=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan and "Sort [k" in plan

def test_write_clustered_produces_disjoint_rowgroup_ranges(spark, tmp_path):
    import pyarrow.parquet as pq
    import glob
    import os

    from pangool_spark.operators.partitioning import write_clustered

    df = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    # randomize input order so clustering, not arrival order, does the work
    shuffled = df.orderBy(F.rand(seed=1))
    path = str(tmp_path / "clustered")
    write_clustered(shuffled, path, ["k"], n_files=8)

    ranges = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "k"
            ranges.append((col.statistics.min, col.statistics.max))
    assert len(ranges) >= 8
    ranges.sort()
    # tight, pairwise-disjoint min/max intervals = file/row-group pruning works
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping row-group ranges {(lo1, hi1)} {(lo2, hi2)}"
    # and the data round-trips complete
    assert spark.read.parquet(path).count() == 20000


def test_column_profile_exact_and_single_scan(spark):
    from pangool_spark.operators.profile import column_profile

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (2, None, 3.5), (4, "a", 9.0)],
        "k LONG, s STRING, v DOUBLE",
    )
    prof = {r.column: r for r in column_profile(df).collect()}
    assert prof["k"].n_rows == 4 and prof["k"].n_null == 0
    assert prof["k"].n_distinct == 3 and prof["k"].min == "1" and prof["k"].max == "4"
    assert prof["s"].n_null == 1 and prof["s"].n_distinct == 2
    assert prof["v"].n_null == 1 and prof["v"].min == "1.5"
    # one pass: exactly one scan of the input relation in the plan
    plan = column_profile(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1
    # approx mode drops the Expand (scale path for wide tables)
    approx_plan = column_profile(df, exact=False)._jdf.queryExecution().optimizedPlan().toString()
    assert "Expand" not in approx_plan


def test_diagnose_skew_reports_hot_keys(spark):
    from pangool_spark.operators.partitioning import diagnose_skew

    rows = [(1,)] * 70 + [(2,)] * 20 + [(3,)] * 10
    df = spark.createDataFrame(rows, "k LONG")
    out = diagnose_skew(df, ["k"], top=2).collect()
    assert [(r.k, r.n_rows, r.rank) for r in out] == [(1, 70, 1), (2, 20, 2)]
    assert abs(out[0].share - 0.7) < 1e-12


def test_diagnose_skew_uses_distributed_topk(spark, sf_dir):
    """The hot-key selection must be a distributed top-k
    (TakeOrderedAndProject), never a partition-less row_number window that
    funnels every distinct key through one task — the skew diagnoser must
    not itself be a skew victim at high key cardinality."""
    from pangool_spark.operators.partitioning import diagnose_skew

    li = load_table(spark, sf_dir, "lineitem")
    plan = (
        diagnose_skew(li, ["l_suppkey"], top=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.splitlines()
    window_at = next(i for i, l in enumerate(lines) if "Window" in l)
    topk_at = next(i for i, l in enumerate(lines) if "TakeOrderedAndProject" in l)
    # the rank window consumes the ≤top-row top-k output DIRECTLY: no
    # Exchange between them (the remaining SinglePartition exchange in the
    # plan is the scalar total's partial→merge aggregate, which moves 32
    # one-row partials, not the counts relation)
    assert topk_at > window_at
    assert not any("Exchange" in l for l in lines[window_at + 1 : topk_at])


def test_compact_small_files(spark, tmp_path):
    import glob

    from pangool_spark.operators.partitioning import compact_small_files

    src = str(tmp_path / "many")
    dst = str(tmp_path / "few")
    spark.range(0, 10000).repartition(32).write.parquet(src)
    assert len(glob.glob(src + "/*.parquet")) == 32
    n = compact_small_files(spark, src, dst, target_mb=128)
    assert n == 1
    assert len(glob.glob(dst + "/*.parquet")) == 1
    assert spark.read.parquet(dst).count() == 10000


def test_compact_small_files_can_split_big_files(spark, tmp_path):
    """coalesce cannot RAISE partition count: when the target exceeds the
    scan's partitions (huge files being split back toward target_mb), the
    rewrite must repartition, and the return value is the count of files
    actually written."""
    import glob

    from pangool_spark.operators.partitioning import compact_small_files

    src = str(tmp_path / "one_big")
    dst = str(tmp_path / "split")
    # random doubles defeat parquet compression → a few MB in ONE file
    spark.range(0, 1_500_000).select(
        F.col("id"), F.rand(seed=7).alias("x"), F.rand(seed=8).alias("y")
    ).coalesce(1).write.parquet(src)
    assert len(glob.glob(src + "/*.parquet")) == 1
    n = compact_small_files(spark, src, dst, target_mb=2)
    written = len(glob.glob(dst + "/*.parquet"))
    assert n == written
    assert written > 1
    assert spark.read.parquet(dst).count() == 1_500_000


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from pangool_spark.operators.partitioning import write_clustered, write_zordered

    # 64x64 grid, shuffled arrival order
    df = (
        spark.range(0, 4096)
        .select((F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y"))
        .orderBy(F.rand(seed=3))
    )

    def file_boxes(path):
        boxes = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            cols = {md.row_group(0).column(i).path_in_schema: i for i in range(md.num_columns)}
            xs, ys = [], []
            for rg in range(md.num_row_groups):
                sx = md.row_group(rg).column(cols["x"]).statistics
                sy = md.row_group(rg).column(cols["y"]).statistics
                xs += [sx.min, sx.max]
                ys += [sy.min, sy.max]
            boxes.append(((min(xs), max(xs)), (min(ys), max(ys))))
        return boxes

    def files_hit(boxes, dim, lo, hi):
        return sum(1 for b in boxes if not (b[dim][1] < lo or b[dim][0] > hi))

    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(df, zpath, ["x", "y"], mins=[0, 0], maxs=[64, 64], bits=6, n_files=16)
    write_clustered(df, lpath, ["x"], n_files=16)

    zboxes, lboxes = file_boxes(zpath), file_boxes(lpath)
    assert len(zboxes) >= 8 and len(lboxes) >= 8
    # filter on the SECOND dimension: x-clustering prunes nothing, z-order
    # touches only the files whose y-range intersects
    y_query = files_hit(zboxes, 1, 0, 15)
    y_query_linear = files_hit(lboxes, 1, 0, 15)
    assert y_query_linear == len(lboxes)          # every file spans all y
    assert y_query <= len(zboxes) // 2            # z-order prunes ≥ half
    # and the first dimension still prunes too
    assert files_hit(zboxes, 0, 0, 15) <= len(zboxes) // 2
    # data integrity
    assert spark.read.parquet(zpath).count() == 4096


def test_zorder_value_validation(spark):
    import pytest as _pytest

    from pangool_spark.operators.partitioning import zorder_value

    with _pytest.raises(ValueError):
        zorder_value(["a"], [0], [1, 2])
    with _pytest.raises(ValueError):
        zorder_value(["a", "b", "c"], [0] * 3, [1] * 3, bits=22)
