"""Scalar quantization: codes, reconstruction error bound, ADC search."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators.similarity import (
    dequantize_embeddings,
    knn_bruteforce,
    quantize_embeddings,
    quantized_knn,
)


def test_codes_and_reconstruction_closed_form(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 10.0]), (2, [1.0, 5.0]), (3, [0.5, 0.0])],
        "vec_id bigint, embedding array<float>",
    )
    codes, bounds = quantize_embeddings(df)
    got = {r.vec_id: list(r.codes) for r in codes.collect()}
    assert got == {1: [0, 255], 2: [255, 128], 3: [128, 0]}
    [b] = bounds.collect()
    assert (list(b.lo), list(b.hi)) == ([0.0, 0.0], [1.0, 10.0])
    rec = {
        r.vec_id: r.embedding
        for r in dequantize_embeddings(codes, bounds).collect()
    }
    # exact endpoints reconstruct exactly
    assert rec[1] == [0.0, 10.0]


def test_error_bounded_by_half_step(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-5, 5) for _ in range(8)]) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    codes, bounds = quantize_embeddings(df)
    rec = dequantize_embeddings(codes, bounds, out_col="r")
    [b] = bounds.collect()
    joined = df.join(rec, "vec_id").select(
        F.posexplode(
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                F.col("r"),
                lambda a, c: F.abs(a - c),
            )
        ).alias("d", "err")
    )
    for r in joined.groupBy("d").agg(F.max("err").alias("e")).collect():
        half_step = (b.hi[r.d] - b.lo[r.d]) / 255.0 / 2.0
        assert r.e <= half_step + 1e-12, f"dim {r.d}: {r.e} > {half_step}"


def test_constant_dimension_roundtrips(spark):
    df = spark.createDataFrame(
        [(1, [7.0, 1.0]), (2, [7.0, 2.0])], "vec_id bigint, embedding array<float>"
    )
    codes, bounds = quantize_embeddings(df)
    assert {tuple(r.codes)[0] for r in codes.collect()} == {0}
    rec = {r.vec_id: r.embedding[0] for r in dequantize_embeddings(codes, bounds).collect()}
    assert rec == {1: 7.0, 2: 7.0}


def test_adc_recall_on_fixture(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(emb, q, k=5).collect()
    }
    adc = {
        (r.query_id, r.neighbor_id)
        for r in quantized_knn(emb, q, k=5).collect()
    }
    recall = len(exact & adc) / len(exact)
    assert recall >= 0.9, f"8-bit ADC recall {recall} vs exact top-5"


def test_bits_validation(spark):
    df = spark.createDataFrame([(1, [0.0])], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="bits"):
        quantize_embeddings(df, bits=0)
