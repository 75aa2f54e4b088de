"""Named outputs (PangoolMultipleOutputs parity) + external sink pattern."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.plans import JobBuilder, PlanError


def test_reducer_named_outputs_topic_fingerprint(spark):
    # TopicFingerprint shape (EX/topicalwordcount/TopicFingerprint.java:85-118):
    # main output = top-2 words per topic; named output "totalcount" =
    # (topic, totalcount) written once per topic from the same reduce pass.
    counts = spark.createDataFrame(
        [(1, "foo", 5), (1, "bar", 3), (1, "baz", 1), (2, "qux", 2)],
        "topic INT, word STRING, count INT",
    )

    def reduce_fn(key, pdf, collector):
        for _, r in pdf.head(2).iterrows():
            collector.write({"topic": int(r["topic"]), "word": r["word"], "count": int(r["count"])})
        collector.write(
            {"topic": int(key[0]), "totalcount": int(pdf["count"].sum())}, output="totalcount"
        )

    jb = (
        JobBuilder(spark, "fingerprint")
        .add_input(counts, "topic:int,word:string,count:int")
        .set_group_by("topic")
        .set_order_by("topic:asc,count:desc")
        .set_reducer(reduce_fn, "topic:int,word:string,count:int")
        .add_named_output("totalcount", "topic:int,totalcount:int")
    )
    outs = jb.to_dataframes()
    main = {(r.topic, r.word): r["count"] for r in outs[""].collect()}
    totals = {r.topic: r.totalcount for r in outs["totalcount"].collect()}
    assert main == {(1, "foo"): 5, (1, "bar"): 3, (2, "qux"): 2}
    assert totals == {1: 9, 2: 2}


def test_named_output_requires_reducer(spark):
    df = spark.createDataFrame([(1,)], "a INT")
    jb = (
        JobBuilder(spark)
        .add_input(df, "a:int")
        .set_group_by("a")
        .aggregate(F.count(F.lit(1)).alias("c"))
        .add_named_output("side", "a:int")
    )
    with pytest.raises(PlanError):
        jb.to_dataframes()


def test_external_sink_batches(spark):
    import json
    import os
    import tempfile

    from pangool_spark.sources.external import external_sink

    # fake "service": each batch appended as a JSON line to a shared file
    log = os.path.join(tempfile.mkdtemp(), "sink.log")

    def send_batch(client, batch):
        with open(log, "a") as f:
            f.write(json.dumps(len(batch)) + "\n")

    df = spark.createDataFrame([(i,) for i in range(25)], "n INT").coalesce(1)
    external_sink(df, send_batch, batch_size=10)
    sizes = [json.loads(line) for line in open(log)]
    assert sorted(sizes) == [5, 10, 10]


def test_named_outputs_preserve_rich_types(spark):
    # Arrow-native tagged struct: timestamps/binary/doubles keep full
    # fidelity through named outputs (a JSON round-trip would stringify)
    import datetime

    from pangool_spark.plans import JobBuilder

    ts = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)

    def red(key, pdf, collector):
        collector.write({"k": int(key[0]), "when": ts, "blob": b"\x00\xfe"})
        collector.write({"k": int(key[0]), "n": len(pdf)}, output="counts")

    jb = (
        JobBuilder(spark, "rich_types")
        .add_input(spark.createDataFrame([(1, 1.0), (1, 2.0)], "g INT, v DOUBLE"), "g:int,v:double")
        .set_group_by("g")
        .set_reducer(red, "k:long,when:timestamp,blob:bytes")
        .add_named_output("counts", "k:long,n:long")
    )
    outs = jb.to_dataframes()
    main = outs[""].collect()
    assert main[0].when == ts and bytes(main[0].blob) == b"\x00\xfe"
    assert [(r.k, r.n) for r in outs["counts"].collect()] == [(1, 2)]


def test_solr_sink_batching_and_converter(spark):
    # TupleSolrOutputFormat parity (TupleSolrOutputFormat.java:78-96,
    # BatchWriter.java:153-200): batch_size batches, bounded pending queue
    # with caller-runs back-pressure, exactly-once delivery, and the
    # default converter's primitive-only field check.
    import json
    import os
    import tempfile


    import pytest

    from pangool_spark.sources.external import solr_sink

    log = os.path.join(tempfile.mkdtemp(), "solr.log")

    def send_batch(client, docs):
        # single O_APPEND write per batch: atomic under concurrent senders
        line = json.dumps([d["n"] for d in docs]) + "\n"
        fd = os.open(log, os.O_WRONLY | os.O_APPEND | os.O_CREAT, 0o644)
        try:
            os.write(fd, line.encode())
        finally:
            os.close(fd)

    df = spark.createDataFrame([(i,) for i in range(53)], "n INT").coalesce(1)
    # queue_size=1 + thread_count=1 forces the caller-runs path too
    solr_sink(df, send_batch, batch_size=20, thread_count=1, queue_size=1)
    batches = [json.loads(line) for line in open(log)]
    sizes = sorted(len(b) for b in batches)
    assert sizes == [13, 20, 20]
    assert sorted(n for b in batches for n in b) == list(range(53))

    # default converter rejects non-primitive columns up front
    bad = spark.createDataFrame([(1, [1, 2])], "k INT, arr ARRAY<INT>")
    with pytest.raises(TypeError, match="not supported for Tuple SOLR"):
        solr_sink(bad, send_batch)


def test_solr_sink_propagates_send_errors(spark):
    from pangool_spark.sources.external import solr_sink

    def send_batch(client, docs):
        raise RuntimeError("index unavailable")

    df = spark.createDataFrame([(i,) for i in range(5)], "n INT").coalesce(1)
    import pytest

    with pytest.raises(Exception, match="index unavailable"):
        solr_sink(df, send_batch, batch_size=2)


def test_vectorized_reducer_named_outputs_one_shuffle(spark):
    """v2 (keys, offsets, rows) reducers can drive named outputs: return a
    dict of frames, one per output. The whole job still runs in ONE
    shuffle — plan-gated below."""
    import numpy as np
    import pandas as pd

    counts = spark.createDataFrame(
        [(1, "foo", 5), (1, "bar", 3), (1, "baz", 1), (2, "qux", 2), (3, "zap", 7)],
        "topic INT, word STRING, count INT",
    )

    def reduce_fn(keys, offsets, rows):
        sums = np.add.reduceat(rows["count"].to_numpy(), offsets[:-1])
        n_rows = np.diff(offsets)
        # main: rows of groups with >1 word; totals: every group
        main_mask = n_rows > 1
        return {
            "": pd.DataFrame(
                {"topic": keys["topic"][main_mask], "n_words": n_rows[main_mask]}
            ),
            "totals": pd.DataFrame({"topic": keys["topic"], "total": sums}),
        }

    jb = (
        JobBuilder(spark, "vec_named")
        .add_input(counts, "topic:int,word:string,count:int")
        .set_group_by("topic")
        .set_reducer(reduce_fn, "topic:int,n_words:long", vectorized=True)
        .add_named_output("totals", "topic:int,total:long")
    )
    outs = jb.to_dataframes()
    plan = outs[""]._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan
    assert {(r.topic, r.n_words) for r in outs[""].collect()} == {(1, 3)}
    assert {(r.topic, r.total) for r in outs["totals"].collect()} == {
        (1, 9),
        (2, 2),
        (3, 7),
    }


def test_vectorized_reducer_dict_without_named_outputs_fails(spark):
    import pandas as pd

    df = spark.createDataFrame([(1, 2.0)], "g INT, v DOUBLE")

    def bad(keys, offsets, rows):
        return {"": pd.DataFrame({"g": keys["g"], "n": [1] * len(keys)})}

    jb = (
        JobBuilder(spark, "vec_bad")
        .add_input(df, "g:int,v:double")
        .set_group_by("g")
        .set_reducer(bad, "g:int,n:long", vectorized=True)
    )
    with pytest.raises(Exception, match="no.*named outputs|PythonException"):
        jb.to_dataframe().collect()


def test_vectorized_reducer_undeclared_output_fails(spark):
    import pandas as pd

    df = spark.createDataFrame([(1, 2.0)], "g INT, v DOUBLE")

    def bad(keys, offsets, rows):
        return {"typo": pd.DataFrame({"g": keys["g"], "n": [1] * len(keys)})}

    jb = (
        JobBuilder(spark, "vec_typo")
        .add_input(df, "g:int,v:double")
        .set_group_by("g")
        .set_reducer(bad, "g:int,n:long", vectorized=True)
        .add_named_output("totals", "g:int,n:long")
    )
    outs = jb.to_dataframes()
    with pytest.raises(Exception, match="undeclared named output"):
        outs["totals"].collect()


def test_vectorized_named_outputs_preserve_rich_types(spark):
    # the Arrow-native tagged path must carry timestamps/binary/doubles
    # with full fidelity, like the per-group collector path does
    import datetime

    import pandas as pd

    ts = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)

    def vred(keys, offsets, rows):
        import numpy as np

        return {
            "": pd.DataFrame(
                {"k": keys["g"].astype("int64"), "when": [ts] * len(keys), "blob": [b"\x00\xfe"] * len(keys)}
            ),
            "counts": pd.DataFrame(
                {"k": keys["g"].astype("int64"), "n": np.diff(offsets)}
            ),
        }

    jb = (
        JobBuilder(spark, "vec_rich")
        .add_input(
            spark.createDataFrame([(1, 1.0), (1, 2.0), (2, 9.0)], "g INT, v DOUBLE"),
            "g:int,v:double",
        )
        .set_group_by("g")
        .set_reducer(vred, "k:long,when:timestamp,blob:bytes", vectorized=True)
        .add_named_output("counts", "k:long,n:long")
    )
    outs = jb.to_dataframes()
    main = {r.k: r for r in outs[""].collect()}
    assert main[1].when == ts and bytes(main[1].blob) == b"\x00\xfe"
    assert {(r.k, r.n) for r in outs["counts"].collect()} == {(1, 2), (2, 1)}
