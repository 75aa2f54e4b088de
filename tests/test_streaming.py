"""Structured Streaming extension: the streaming path must produce the same
results as the batch path (run a real micro-batch stream to completion)."""

import os

import pytest
from pyspark.sql import functions as F

from pangool_spark.streaming import read_stream, sessionize, stream_dedup, windowed_agg


@pytest.fixture(scope="module")
def event_rows():
    # two users; user 1 has two sessions (gap > 30 min)
    return [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0),
        (2, "2024-01-01 10:10:00", 1, "click", 2.0),
        (3, "2024-01-01 11:30:00", 1, "view", 3.0),
        (4, "2024-01-01 10:05:00", 2, "click", 4.0),
        (2, "2024-01-01 10:10:00", 1, "click", 2.0),  # duplicate event_id
    ]


@pytest.fixture(scope="module")
def batch_df(spark, event_rows):
    df = spark.createDataFrame(
        event_rows, "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


@pytest.fixture(scope="module")
def stream_source(spark, batch_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_src"))
    batch_df.write.mode("overwrite").parquet(path)
    return path, batch_df.schema


def _run_stream_to_memory(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if sdf.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_windowed_agg_stream_matches_batch(spark, batch_df, stream_source):
    path, schema = stream_source
    stream = read_stream(spark, path, schema)
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")]
    got_stream = _run_stream_to_memory(
        spark, windowed_agg(stream, "ts", "1 hour", aggs, keys=["user_id"]), "win_agg"
    )
    got_batch = windowed_agg(batch_df, "ts", "1 hour", aggs, keys=["user_id"])
    assert sorted(map(tuple, got_stream.collect())) == sorted(map(tuple, got_batch.collect()))


def test_sessionize_stream_matches_batch(spark, batch_df, stream_source):
    path, schema = stream_source
    dedup_batch = batch_df.dropDuplicates(["event_id"])
    got_batch = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in sessionize(dedup_batch).collect()
    }
    # user 1: sessions [10:00-10:40] (2 events) and [11:30-12:00]
    assert len(got_batch) == 3
    stream = stream_dedup(read_stream(spark, path, schema))
    got_stream = _run_stream_to_memory(spark, sessionize(stream, watermark=None), "sess")
    assert {
        (r.user_id, r.session_start, r.session_end): r.n_events for r in got_stream.collect()
    } == got_batch


def test_stream_dedup_batch_path(batch_df):
    assert stream_dedup(batch_df).count() == 4


def test_stream_dedup_real_stream(spark, stream_source):
    # the streaming path for real: duplicates (same event_id) within the
    # watermark horizon are dropped by the state store, output appends
    path, schema = stream_source
    sdf = read_stream(spark, path, schema)
    deduped = stream_dedup(sdf, keys=["event_id"], ts_col="ts", watermark="2 hours")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_stream")
    assert got.count() == 4
    assert {r.event_id for r in got.collect()} == {1, 2, 3, 4}


def test_text_quality_ops_compose_with_streams(spark, tmp_path_factory):
    """pii_redact / repetition_stats / language_id_expr are stateless
    projections, so they must run unchanged on a streaming DataFrame —
    the curation filter stage works as a streaming pre-filter."""
    from pangool_spark.operators.text import (
        language_id_expr,
        pii_redact,
        repetition_stats,
    )

    rows = [
        (1, "the quick brown fox and the lazy dog mail me x@y.io"),
        (2, "spam spam spam spam spam"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    path = str(tmp_path_factory.mktemp("docs_stream"))
    df.write.mode("overwrite").parquet(path)
    sdf = spark.readStream.schema(df.schema).parquet(path)

    def run_append(sdf_, name):
        q = (
            sdf_.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")  # projections have no aggregation state
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        return spark.table(name)

    redacted = pii_redact(sdf)
    reps = repetition_stats(sdf)
    langs = sdf.select("doc_id", language_id_expr("text").alias("lang"))
    out1 = run_append(redacted, "pii_stream")
    out2 = run_append(reps, "rep_stream")
    out3 = run_append(langs, "lang_stream")

    r = {row.doc_id: row for row in out1.collect()}
    assert r[1].n_email == 1 and "<EMAIL>" in r[1].redacted
    assert r[2].n_email == 0
    s = {row.doc_id: row for row in out2.collect()}
    assert s[2].dup_token_ratio == 0.8
    assert {row.doc_id: row.lang for row in out3.collect()}[1] == "en"


def test_contamination_filter_stream_matches_batch(spark, tmp_path_factory):
    """contamination_filter is a stateless projection-filter, so it serves
    as a streaming ingest decontaminator; its batch output must agree with
    the stateful decontaminate() operator row-for-row."""
    from pangool_spark.operators.dedup import contamination_filter, decontaminate

    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], "qid LONG, text STRING"
    )
    rows = [
        (1, "prefix alpha beta gamma delta epsilon zeta suffix"),  # contaminated
        (2, "totally unrelated words about shuffle exchange plans"),
        (3, "alpha beta something else entirely here"),  # only 1 shared 3-gram? none
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    batch_stateless = sorted(
        r.doc_id for r in contamination_filter(docs, bench, n=3, min_overlap=2).collect()
    )
    batch_stateful = sorted(
        r.doc_id for r in decontaminate(docs, bench, n=3, min_overlap=2).collect()
    )
    assert batch_stateless == batch_stateful == [2, 3]

    path = str(tmp_path_factory.mktemp("decontam_stream"))
    docs.write.mode("overwrite").parquet(path)
    sdf = spark.readStream.schema(docs.schema).parquet(path)
    q = (
        contamination_filter(sdf, bench, n=3, min_overlap=2)
        .writeStream.format("memory")
        .queryName("decontam_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(r.doc_id for r in spark.table("decontam_stream").collect())
    assert got == [2, 3]


def test_py_minhash_signature_matches_spark_operator(spark):
    """The streaming filter's Python signature path must agree
    signature-for-signature with minhash_signatures(portable) — any drift
    silently changes which documents the ingest filter drops."""
    from pangool_spark.operators.dedup import minhash_signatures, py_minhash_signature

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again today"),
        (2, "Short  DOC"),              # < n tokens -> whole-string shingle
        (3, "one two three"),           # exactly n tokens
        (4, "  WS   and\tCASE  mix\n"),  # normalization stress
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    spark_sigs = {
        r.doc_id: list(r.signature) for r in minhash_signatures(df).collect()
    }
    for did, text in rows:
        py = py_minhash_signature(text)
        assert py is not None and list(py) == spark_sigs[did], did
    assert py_minhash_signature("") is None
    assert py_minhash_signature(None) is None


def test_stream_minhash_filter_matches_batch_op(spark, tmp_path_factory):
    from pangool_spark.operators.dedup import minhash_lsh_against, minhash_signatures
    from pangool_spark.streaming.ops import stream_minhash_filter

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(1, base), (2, "ancient unrelated text about btree indexes and vacuum")],
        "doc_id LONG, text STRING",
    )
    ref_sigs = minhash_signatures(corpus)
    batch = spark.createDataFrame(
        [
            (10, base.replace("lazy", "sleepy")),  # near-dup of 1 -> dropped
            (11, "wholly novel content here"),
            (12, ""),                              # no shingles -> passes
        ],
        "doc_id LONG, text STRING",
    )
    # batch parity: survivors = batch minus the batch op's matched ids
    dropped = {
        r.id_new
        for r in minhash_lsh_against(batch, ref_sigs, threshold=0.3).collect()
    }
    got = sorted(
        r.doc_id
        for r in stream_minhash_filter(batch, ref_sigs, threshold=0.3).collect()
    )
    assert dropped == {10}
    assert got == [11, 12]

    # real micro-batch stream
    path = str(tmp_path_factory.mktemp("minhash_stream"))
    batch.write.mode("overwrite").parquet(path)
    sdf = spark.readStream.schema(batch.schema).parquet(path)
    q = (
        stream_minhash_filter(sdf, ref_sigs, threshold=0.3)
        .writeStream.format("memory")
        .queryName("minhash_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert sorted(r.doc_id for r in spark.table("minhash_stream").collect()) == [11, 12]

    # wrong-parameter index raises at build time
    short = minhash_signatures(corpus, num_hashes=32)
    with pytest.raises(ValueError, match="num_hashes"):
        stream_minhash_filter(batch, short, num_hashes=64)


def test_stream_dedup_against_standing_corpus(spark, tmp_path_factory):
    from pangool_spark.streaming.ops import stream_dedup_against

    corpus = spark.createDataFrame(
        [(1, "already ingested document text")], "doc_id LONG, text STRING"
    )
    batch = spark.createDataFrame(
        [
            (10, "ALREADY   ingested document text"),  # dup after normalization
            (11, "genuinely new arrival"),
        ],
        "doc_id LONG, text STRING",
    )
    # batch path parity
    assert [r.doc_id for r in stream_dedup_against(batch, corpus).collect()] == [11]
    # real micro-batch stream
    path = str(tmp_path_factory.mktemp("ingest_stream"))
    batch.write.mode("overwrite").parquet(path)
    sdf = spark.readStream.schema(batch.schema).parquet(path)
    q = (
        stream_dedup_against(sdf, corpus)
        .writeStream.format("memory")
        .queryName("ingest_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert [r.doc_id for r in spark.table("ingest_dedup").collect()] == [11]


def test_stream_cms_matches_batch_sketch(spark, tmp_path_factory):
    """Stream-maintained grid == batch-built grid over the same rows
    (merge algebra), and estimates from the standing state match exact
    counts when the grid is collision-free."""
    from pangool_spark.operators.sketch import cms_estimate, count_min_sketch
    from pangool_spark.streaming.ops import stream_cms

    rows = [(w,) for w in ["a"] * 30 + ["b"] * 12 + ["c"] * 5 + ["d"]]
    df = spark.createDataFrame(rows, "w STRING")
    src = str(tmp_path_factory.mktemp("cms_src"))
    state = str(tmp_path_factory.mktemp("cms_state")) + "/grid"
    ckpt = str(tmp_path_factory.mktemp("cms_ckpt"))
    # two files so the availableNow run sees more than one input split
    df.filter("w IN ('a','c')").write.mode("overwrite").parquet(src + "/p1")
    df.filter("w NOT IN ('a','c')").write.mode("overwrite").parquet(src + "/p2")
    stream = (
        spark.readStream.schema("w STRING").option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = stream_cms(stream, "w", state, width=256, depth=3, checkpoint_dir=ckpt)
    q.awaitTermination(120)

    standing = spark.read.parquet(state)
    batch = count_min_sketch(df, "w", width=256, depth=3, hash_family="fast")
    assert {(r.j, r.bucket, r.n) for r in standing.collect()} == {
        (r.j, r.bucket, r.n) for r in batch.collect()
    }
    keys = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("zz",)], "w STRING")
    est = {
        r.w: r.est_count
        for r in cms_estimate(standing, keys, "w", width=256, depth=3, hash_family="fast").collect()
    }
    assert est["a"] == 30 and est["b"] == 12 and est["c"] == 5 and est["d"] == 1
    assert est["zz"] >= 0  # absent key: over-count only


def test_stream_cms_replay_is_idempotent(spark, tmp_path_factory):
    """Replaying an already-folded micro-batch (retry after a failure
    between the state overwrite and the checkpoint commit) must not
    double-count the grid — the stream_histogram_drift pattern."""
    from pangool_spark.operators.sketch import cms_estimate
    from pangool_spark.streaming.ops import stream_cms

    df = spark.createDataFrame([("a",)] * 10 + [("b",)] * 3, "w STRING")
    src = str(tmp_path_factory.mktemp("cmsr_src"))
    state = str(tmp_path_factory.mktemp("cmsr_state")) + "/grid"
    base = str(tmp_path_factory.mktemp("cmsr_ckpt"))
    df.coalesce(1).write.mode("overwrite").parquet(src + "/p1")

    def run(ckpt):
        stream = spark.readStream.schema("w STRING").parquet(src + "/*")
        q = stream_cms(stream, "w", state, width=64, depth=3,
                       checkpoint_dir=f"{base}/{ckpt}")
        q.awaitTermination(120)

    run("c1")
    # fresh checkpoint + same state dir == the engine replaying batch 0
    # against a grid that already folded it
    run("c2")
    keys = spark.createDataFrame([("a",), ("b",)], "w STRING")
    est = {
        r.w: r.est_count
        for r in cms_estimate(
            spark.read.parquet(state), keys, "w", width=64, depth=3,
            hash_family="fast",
        ).collect()
    }
    assert est == {"a": 10, "b": 3}  # not doubled


def test_stream_outliers_matches_batch(spark, tmp_path_factory):
    import uuid as _uuid

    from pangool_spark.operators.stats import grouped_outliers, outlier_stats
    from pangool_spark.streaming.ops import read_stream, stream_outliers

    # one spike per group, enough inliers that it clears z=2 (a single
    # spike's z is capped at (n-1)/sqrt(n) — n must be ~7+ to exceed 2)
    rows = [(0, i, v) for i, v in enumerate([1, 2, 1, 3, 2, 1, 2, 500])] + [
        (1, 100 + i, v) for i, v in enumerate([7, 9, 8, 7, 8, 9, 7, 8, 9, -900])
    ]
    batch = spark.createDataFrame(rows, "g INT, rid LONG, y LONG")
    stats = outlier_stats(batch, ["g"], "y")
    path = str(tmp_path_factory.mktemp("so_in"))
    batch.write.mode("overwrite").parquet(path)
    s = read_stream(spark, path, batch.schema)
    flagged = stream_outliers(s, stats, ["g"], "y", z=2.0)
    name = f"so_{_uuid.uuid4().hex[:8]}"
    q = (
        flagged.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r.g, r.rid, r.y, r.zscore)
        for r in spark.table(name).collect()
    }
    want = {
        (r.g, r.rid, r.y, r.zscore)
        for r in grouped_outliers(batch, ["g"], "y", z=2.0).collect()
    }
    assert got == want and {(g, y) for g, _, y, _ in got} == {(0, 500), (1, -900)}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="static"):
        stream_outliers(s, s, ["g"], "y")
