"""JobBuilder end-to-end parity with the reference's example corpus
(fixtures from FIXTURES.md; cites EX/ = examples/src/main/java/.../examples/)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pangool_spark.orderby import OrderBy
from pangool_spark.plans import JobBuilder, MapOnlyJobBuilder, PlanError, RollupReducer
from pangool_spark.schema import Fields, Schema, with_aliases


# --- TopicalWordCount (EX/topicalwordcount/TopicalWordCount.java:52-102;
# fixture TestTopicalWordCount.java:87-107) ---------------------------------
def test_topical_wordcount_algebraic(spark):
    docs = spark.createDataFrame(
        [("foo bar bar", 1), ("foo blah bloh", 1), ("bar bar bor", 2)],
        "text STRING, topicId INT",
    )
    tokens = docs.select(
        F.explode(F.split("text", r"\s+")).alias("word"), F.col("topicId").alias("topic")
    )
    jb = (
        JobBuilder(spark, "wordcount")
        .add_input(tokens, "word:string,topic:int")
        .set_group_by("topic", "word")
        .aggregate(F.count(F.lit(1)).alias("count"))
    )
    got = {(r.topic, r.word): r["count"] for r in jb.to_dataframe().collect()}
    assert got == {
        (1, "foo"): 2,
        (1, "bar"): 2,
        (1, "blah"): 1,
        (1, "bloh"): 1,
        (2, "bar"): 2,
        (2, "bor"): 1,
    }


# --- SecondarySort (EX/secondarysort/SecondarySort.java:45-132) ------------
def test_secondary_sort_reducer_sees_sorted_rows(spark):
    rows = [
        (1, "a", 30, 3.0),
        (1, "a", 10, 1.0),
        (1, "a", 20, 2.0),
        (2, "b", 5, 9.0),
        (1, "c", 7, 4.0),
    ]
    df = spark.createDataFrame(
        rows, "intField INT, strField STRING, longField LONG, doubleField DOUBLE"
    )

    def reduce_fn(key, pdf, collector):
        # rows must arrive sorted by longField ASC within the group
        assert list(pdf["longField"]) == sorted(pdf["longField"])
        collector.write(
            {
                "intField": int(pdf["intField"].iloc[0]),
                "strField": str(pdf["strField"].iloc[0]),
                "first_long": int(pdf["longField"].iloc[0]),
                "total": float(pdf["doubleField"].sum()),
            }
        )

    jb = (
        JobBuilder(spark, "secondary_sort")
        .add_input(df, "intField:int,strField:string,longField:long,doubleField:double")
        .set_group_by("intField", "strField")
        .set_order_by("intField:asc,strField:asc,longField:asc")
        .set_reducer(reduce_fn, "intField:int,strField:string,first_long:long,total:double")
    )
    got = {(r.intField, r.strField): (r.first_long, r.total) for r in jb.to_dataframe().collect()}
    assert got == {(1, "a"): (10, 6.0), (2, "b"): (5, 9.0), (1, "c"): (7, 4.0)}


# --- UrlResolution co-group join w/ aliases (EX/urlresolution/UrlResolution.java:46-119)
def test_url_resolution_cogroup(spark):
    url_map = spark.createDataFrame(
        [("http://a", "http://A"), ("http://b", "http://B")],
        "nonCanonicalUrl STRING, canonicalUrl STRING",
    )
    registers = spark.createDataFrame(
        [("http://a", 20, "ip2"), ("http://a", 10, "ip1"), ("http://c", 5, "ip3")],
        "url STRING, timestamp LONG, ip STRING",
    )
    map_fields = Fields.parse("url:string,canonicalUrl:string?")
    map_schema = Schema("urlMap", [with_aliases(map_fields[0], "nonCanonicalUrl"), map_fields[1]])

    def resolve(key, pdf, collector):
        canon = None
        maps = pdf[pdf["__schema__"] == "urlMap"]
        if len(maps):
            canon = maps["canonicalUrl"].iloc[0]
        regs = pdf[pdf["__schema__"] == "urlRegister"]
        collector.count("resolved" if canon is not None else "unresolved", len(regs))
        for _, r in regs.iterrows():
            collector.write(
                {
                    "url": canon if canon is not None else r["url"],
                    "timestamp": int(r["timestamp"]),
                    "ip": r["ip"],
                }
            )

    jb = (
        JobBuilder(spark, "urlresolution")
        .add_input(url_map, map_schema)
        .add_input(registers, Schema.parse("urlRegister", "url:string,timestamp:long?,ip:string?"))
        .set_group_by("url")
        .set_specific_order_by("urlRegister", "timestamp:asc")
        .set_reducer(resolve, "url:string,timestamp:long,ip:string")
    )
    got = [(r.url, r.timestamp, r.ip) for r in jb.to_dataframe().orderBy("timestamp").collect()]
    assert got == [("ip3-url" and "http://c", 5, "ip3"), ("http://A", 10, "ip1"), ("http://A", 20, "ip2")]
    # counter surface (PangoolMultipleOutputs.java:48-70 counters): counts
    # observable driver-side after the action
    assert jb.counters == {"resolved": 2, "unresolved": 1}


# --- Rollup callbacks (TestRollup.java event-sequence parity) --------------
class EventRecorder(RollupReducer):
    def on_open_group(self, depth, field, row, collector):
        collector.write({"event": f"OPEN {depth} {row[field]}"})

    def on_close_group(self, depth, field, row, collector):
        collector.write({"event": f"CLOSE {depth} {row[field]}"})

    def on_group_elements(self, group, rows, collector):
        for _, r in rows.iterrows():
            collector.write({"event": f"ELEM {r['a']}-{r['b']}"})


def test_rollup_open_close_sequence(spark):
    # one base partition (a=1) with two sub-groups b=1,b=2 → the reference
    # fires: OPEN a, OPEN b(1), elems, CLOSE b(1), OPEN b(2), elems,
    # CLOSE b(2), CLOSE a  (RollupReducer.java:129-202, trailing closes :138-145)
    df = spark.createDataFrame([(1, 1), (1, 1), (1, 2)], "a INT, b INT")
    jb = (
        JobBuilder(spark, "rollup")
        .add_input(df, "a:int,b:int")
        .set_group_by("a", "b")
        .set_rollup_from("a")
        .set_rollup_reducer(EventRecorder(), "event:string")
    )
    events = [r.event for r in jb.to_dataframe().collect()]
    assert events == [
        "OPEN 0 1",
        "OPEN 1 1",
        "ELEM 1-1",
        "ELEM 1-1",
        "CLOSE 1 1",
        "OPEN 1 2",
        "ELEM 1-2",
        "CLOSE 1 2",
        "CLOSE 0 1",
    ]


def test_rollup_min_depth_clamps_to_rollup_from(spark):
    # rollup_from="b" (depth 1) => depth-0 events NEVER fire; fields before
    # rollup-from are partition constants (RollupReducer.java:79 minDepth,
    # :167-168 mismatch clamp).
    df = spark.createDataFrame([(1, 1, 1), (1, 1, 2), (1, 2, 3)], "a INT, b INT, c INT")
    jb = (
        JobBuilder(spark, "rollup_clamp")
        .add_input(df, "a:int,b:int,c:int")
        .set_group_by("a", "b", "c")
        .set_rollup_from("b")
        .set_rollup_reducer(EventRecorder(), "event:string")
    )
    events = [r.event for r in jb.to_dataframe().collect()]
    assert not any(e.startswith(("OPEN 0", "CLOSE 0")) for e in events)
    # base = (a, b): the two b-groups may land in different partitions, so
    # assert per-depth event counts, not a global order.
    assert sum(1 for e in events if e.startswith("OPEN 1")) == 2
    assert sum(1 for e in events if e.startswith("CLOSE 1")) == 2
    assert sum(1 for e in events if e.startswith("OPEN 2")) == 3
    assert sum(1 for e in events if e.startswith("CLOSE 2")) == 3


def test_rollup_many_base_groups_one_partition(spark):
    # Multiple base groups hash into shared partitions; each must open and
    # close independently with correct element slices.
    rows = [(a, b) for a in range(1, 9) for b in (1, 2) for _ in range(3)]
    df = spark.createDataFrame(rows, "a INT, b INT")
    jb = (
        JobBuilder(spark, "rollup_multi")
        .add_input(df, "a:int,b:int")
        .set_group_by("a", "b")
        .set_rollup_from("a")
        .set_rollup_reducer(EventRecorder(), "event:string")
    )
    events = [r.event for r in jb.to_dataframe().collect()]
    assert sum(1 for e in events if e.startswith("OPEN 0")) == 8
    assert sum(1 for e in events if e.startswith("CLOSE 0")) == 8
    assert sum(1 for e in events if e.startswith("OPEN 1")) == 16
    assert sum(1 for e in events if e.startswith("ELEM")) == 48


# --- aggregate-form rollup through the builder -----------------------------
def test_jobbuilder_aggregate_rollup(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4)], "g1 STRING, g2 STRING, v INT"
    )
    jb = (
        JobBuilder(spark, "rollup_agg")
        .add_input(df, "g1:string,g2:string,v:int")
        .set_group_by("g1", "g2")
        .set_rollup_from("g1")
        .aggregate(F.sum("v").alias("total"))
    )
    got = {(r.g1, r.g2): r.total for r in jb.to_dataframe().collect()}
    assert got == {
        ("a", "x"): 1,
        ("a", "y"): 2,
        ("b", "x"): 4,
        ("a", None): 3,
        ("b", None): 4,
        (None, None): 7,
    }


# --- builder validation (TestConfigBuilder layer) --------------------------
def test_validation_errors(spark):
    df = spark.createDataFrame([(1, "x")], "a INT, b STRING")
    jb = JobBuilder(spark).add_input(df, "a:int,b:string")
    with pytest.raises(PlanError):
        jb.to_dataframe()  # no group-by
    jb.set_group_by("zzz")
    with pytest.raises(PlanError):
        jb.aggregate(F.count(F.lit(1)).alias("c")).to_dataframe()  # missing field

    jb2 = (
        JobBuilder(spark)
        .add_input(df, "a:int,b:string")
        .set_group_by("a")
        .set_order_by("b:asc,a:asc")  # group-by not a prefix
        .aggregate(F.count(F.lit(1)).alias("c"))
    )
    with pytest.raises(PlanError):
        jb2.to_dataframe()


def test_group_by_type_mismatch_across_schemas(spark):
    d1 = spark.createDataFrame([(1,)], "k INT")
    d2 = spark.createDataFrame([("x",)], "k STRING")
    jb = (
        JobBuilder(spark)
        .add_input(d1, "k:int")
        .add_input(d2, "k:string")
        .set_group_by("k")
        .aggregate(F.count(F.lit(1)).alias("c"))
    )
    with pytest.raises(PlanError):
        jb.to_dataframe()


# --- map-only (EX/Grep.java:40-80) -----------------------------------------
def test_map_only_grep(spark):
    lines = spark.createDataFrame([("foo",), ("bar",), ("foobar",)], "value STRING")
    job = MapOnlyJobBuilder(spark).add_input(lines, lambda df: df.filter(F.col("value").rlike("foo")))
    got = sorted(r.value for r in job.to_dataframe().collect())
    assert got == ["foo", "foobar"]
    # shuffle-free: the physical plan must contain no Exchange
    plan = job.to_dataframe()._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_vectorized_reducer_contract(spark):
    # v2 contract: fn(keys, offsets, rows) over whole sorted chunks, with
    # batch-spanning groups carried over (forced tiny Arrow batches).
    import numpy as np
    import pandas as pd

    rows = [(k, v) for k in range(50) for v in range(k % 5 + 1)]
    df = spark.createDataFrame(rows, "k INT, v INT")

    def reduce_vec(keys, offsets, pdf):
        vals = pdf["v"].to_numpy()
        return pd.DataFrame(
            {
                "k": keys["k"].to_numpy(),
                "n": np.diff(offsets),
                "total": np.add.reduceat(vals, offsets[:-1]),
            }
        )

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        jb = (
            JobBuilder(spark)
            .add_input(df, "k:int,v:int")
            .set_group_by("k")
            .set_reducer(reduce_vec, "k:int,n:long,total:long", vectorized=True)
        )
        got = {r.k: (r.n, r.total) for r in jb.to_dataframe().collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    exp = {k: (k % 5 + 1, sum(range(k % 5 + 1))) for k in range(50)}
    assert got == exp


def test_vectorized_reducer_supports_named_outputs(spark):
    # the v2 contract drives named outputs by returning {name: frame};
    # full behavior is pinned in test_named_outputs.py — here just check
    # the compile path no longer rejects the combination
    import pandas as pd

    df = spark.createDataFrame([(1, 2)], "k INT, v INT")
    jb = (
        JobBuilder(spark)
        .add_input(df, "k:int,v:int")
        .set_group_by("k")
        .set_reducer(
            lambda k, o, r: {"": pd.DataFrame({"k": k["k"]}), "side": None},
            "k:int",
            vectorized=True,
        )
        .add_named_output("side", "k:int")
    )
    outs = jb.to_dataframes()
    assert set(outs) == {"", "side"}
    assert [r.k for r in outs[""].collect()] == [1]
    assert outs["side"].count() == 0


def test_vectorized_reducer_null_group_keys(spark):
    import numpy as np
    import pandas as pd

    df = spark.createDataFrame(
        [(None, 1), (None, 2), (1, 3), (1, 4), (2, 5)], "k INT, v INT"
    )

    def reduce_vec(keys, offsets, pdf):
        return pd.DataFrame(
            {
                "k": keys["k"].to_numpy(),
                "total": np.add.reduceat(pdf["v"].to_numpy(), offsets[:-1]),
            }
        )

    jb = (
        JobBuilder(spark)
        .add_input(df, "k:int?,v:int")
        .set_group_by("k")
        .set_reducer(reduce_vec, "k:int?,total:long", vectorized=True)
    )
    got = {r.k: r.total for r in jb.to_dataframe().collect()}
    assert got == {None: 3, 1: 7, 2: 5}


def test_asof_join_semantics(spark):
    from datetime import datetime as dt

    from pangool_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [
            (1, 10, dt(2024, 1, 1, 12, 0, 0)),
            (2, 10, dt(2024, 1, 1, 12, 5, 0)),
            (3, 20, dt(2024, 1, 1, 9, 0, 0)),   # before any right row → NULL
        ],
        "event_id LONG, user_id LONG, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (10, dt(2024, 1, 1, 11, 0, 0), 1.0),
            (10, dt(2024, 1, 1, 12, 0, 0), 2.0),   # exact tie with left #1
            (10, dt(2024, 1, 1, 12, 4, 0), 3.0),
            (20, dt(2024, 1, 1, 10, 0, 0), 9.0),
        ],
        "user_id LONG, ts TIMESTAMP, price DOUBLE",
    )
    rows = {r.event_id: r for r in asof_join(left, right, "user_id").collect()}
    assert rows[1].asof_price == 2.0      # allow_exact: ties match
    assert rows[2].asof_price == 3.0      # latest earlier row wins
    assert rows[3].asof_price is None and rows[3].asof_ts is None
    # strict: the equal-ts right row no longer matches
    strict = {
        r.event_id: r
        for r in asof_join(left, right, "user_id", allow_exact=False).collect()
    }
    assert strict[1].asof_price == 1.0


def test_asof_join_single_exchange(spark):
    from datetime import datetime as dt

    from pangool_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, dt(2024, 1, 1))], "event_id LONG, user_id LONG, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [(10, dt(2024, 1, 1), 1.0)], "user_id LONG, ts TIMESTAMP, price DOUBLE"
    )
    plan = asof_join(left, right, "user_id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # window form, not a join at all


def test_funnel_ordering_semantics(spark):
    from datetime import datetime as dt

    from pangool_spark.operators.funnel import funnel

    t = lambda m: dt(2024, 1, 1, 12, m)  # noqa: E731
    rows = [
        # user 1: full ordered funnel
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
        # user 2: purchase BEFORE click → depth 2 only
        (2, t(0), "view"), (2, t(1), "purchase"), (2, t(2), "click"),
        # user 3: starts mid-funnel → depth 0 prefix never opens
        (3, t(0), "click"), (3, t(1), "purchase"),
        # user 4: repeats help (view, view, click)
        (4, t(0), "view"), (4, t(1), "view"), (4, t(2), "click"),
        # user 5: unrelated events only → absent from output
        (5, t(0), "signup"),
    ]
    ev = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP, event_type STRING")
    got = {r.user_id: r.steps_completed for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert got == {1: 3, 2: 2, 3: 0, 4: 2}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel(ev, [])
    with _pytest.raises(ValueError):
        funnel(ev, ["view", "view"])


def test_asof_join_null_keys_match_nothing(spark):
    from datetime import datetime as dt

    from pangool_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, None, dt(2024, 1, 1, 12)), (2, 10, dt(2024, 1, 1, 12))],
        "event_id LONG, user_id LONG, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(None, dt(2024, 1, 1, 11), 9.9), (10, dt(2024, 1, 1, 11), 1.0)],
        "user_id LONG, ts TIMESTAMP, price DOUBLE",
    )
    rows = {r.event_id: r for r in asof_join(left, right, "user_id").collect()}
    # SQL equality: NULL keys never match (DuckDB ASOF / merge_asof parity)
    assert rows[1].asof_price is None and rows[1].asof_ts is None
    assert rows[2].asof_price == 1.0
    assert len(rows) == 2  # null-keyed left row is preserved, not dropped
