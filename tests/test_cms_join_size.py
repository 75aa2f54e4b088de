"""cms_join_size: the sketch inner product never under-counts the true
equi-join cardinality, is exact when the grid has no collisions, and
merged sketches estimate the union."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators.sketch import (
    cms_join_size,
    count_min_sketch,
    merge_sketches,
)


def _true_join_size(rows_a, rows_b):
    from collections import Counter

    fa, fb = Counter(rows_a), Counter(rows_b)
    return sum(fa[k] * fb[k] for k in fa if k in fb)


def test_estimate_never_undercounts(spark):
    rows_a = [str(i % 50) for i in range(500)]
    rows_b = [str(i % 30) for i in range(300)]
    a = spark.createDataFrame([(k,) for k in rows_a], "k STRING")
    b = spark.createDataFrame([(k,) for k in rows_b], "k STRING")
    ga = count_min_sketch(a, "k", width=64, depth=4)
    gb = count_min_sketch(b, "k", width=64, depth=4)
    est = cms_join_size(ga, gb).first()["est_join_size"]
    true = _true_join_size(rows_a, rows_b)
    assert est >= true
    assert est <= 3 * true  # sane over-count at this width


def test_estimate_exact_without_collisions(spark):
    # 8 keys into width 4096: collision-free w.h.p. for every row ->
    # the min over depth rows hits the exact inner product
    rows_a = [str(i % 8) for i in range(80)]
    rows_b = [str(i % 8) for i in range(40)]
    a = spark.createDataFrame([(k,) for k in rows_a], "k STRING")
    b = spark.createDataFrame([(k,) for k in rows_b], "k STRING")
    ga = count_min_sketch(a, "k", width=4096, depth=4)
    gb = count_min_sketch(b, "k", width=4096, depth=4)
    est = cms_join_size(ga, gb).first()["est_join_size"]
    assert est == _true_join_size(rows_a, rows_b)


def test_merged_sketch_estimates_union(spark):
    day1 = [str(i % 10) for i in range(100)]
    day2 = [str(i % 10) for i in range(60)]
    probe = [str(i % 10) for i in range(50)]
    g1 = count_min_sketch(
        spark.createDataFrame([(k,) for k in day1], "k STRING"), "k",
        width=4096, depth=4,
    )
    g2 = count_min_sketch(
        spark.createDataFrame([(k,) for k in day2], "k STRING"), "k",
        width=4096, depth=4,
    )
    gp = count_min_sketch(
        spark.createDataFrame([(k,) for k in probe], "k STRING"), "k",
        width=4096, depth=4,
    )
    est = cms_join_size(merge_sketches(g1, g2), gp).first()["est_join_size"]
    assert est == _true_join_size(day1 + day2, probe)


def test_disjoint_keys_estimate_small(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(200)], "k STRING")
    b = spark.createDataFrame([(f"b{i}",) for i in range(200)], "k STRING")
    ga = count_min_sketch(a, "k", width=2048, depth=4)
    gb = count_min_sketch(b, "k", width=2048, depth=4)
    est = cms_join_size(ga, gb).first()["est_join_size"]
    # true size 0; collisions may add a little, bounded by e/width * n*n
    assert est <= 200 * 200 * 3 / 2048
