"""Deterministic hash sampling / split assignment."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.data import load_table
from pangool_spark.operators.sampling import hash_sample, hash_split


def test_hash_sample_joinable_across_tables(spark, sf_dir):
    # the defining property vs RNG sampling: sampling customers and
    # sampling orders BY THE CUSTOMER KEY yields consistent membership —
    # an order is in the sample iff its customer is
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    c_keys = {r.c_custkey for r in hash_sample(c, "c_custkey", 0.2).collect()}
    o_keys = {r.o_custkey for r in hash_sample(o, "o_custkey", 0.2)
              .select("o_custkey").distinct().collect()}
    all_o_keys = {r.o_custkey for r in o.select("o_custkey").distinct().collect()}
    assert o_keys == c_keys & all_o_keys
    # roughly the requested fraction
    assert 0.1 < len(c_keys) / c.count() < 0.3


def test_hash_split_stable_and_exhaustive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = hash_split(docs.repartition(1), "doc_id", (0.8, 0.1, 0.1))
    b = hash_split(docs.repartition(7), "doc_id", (0.8, 0.1, 0.1))
    ma = {r.doc_id: r.split for r in a.select("doc_id", "split").collect()}
    mb = {r.doc_id: r.split for r in b.select("doc_id", "split").collect()}
    assert ma == mb  # partitioning-independent
    assert set(ma.values()) == {"train", "val", "test"}
    n = len(ma)
    n_train = sum(1 for v in ma.values() if v == "train")
    assert 0.7 < n_train / n < 0.9


def test_sampling_validation_errors(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(docs, "doc_id", 1.5)
    with pytest.raises(ValueError, match="label per weight"):
        hash_split(docs, "doc_id", (0.5, 0.5), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="non-negative"):
        hash_split(docs, "doc_id", (-1.0, 2.0), labels=("a", "b"))


def test_sampling_is_zero_shuffle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    for df in (hash_sample(docs, "doc_id", 0.5), hash_split(docs, "doc_id", (0.9, 0.1), labels=("a", "b"))):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_pack_sequences_bins_respect_budget_modulo_overrun(spark, sf_dir):
    from pangool_spark.operators.sampling import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")).alias("n_tokens"),
    )
    out = pack_sequences(toks, budget=256, n_shards=8).toPandas()
    assert len(out) == docs.count()  # one assignment per document
    max_doc = out["n_tokens"].max()
    for (_, _), grp in out.groupby(["shard", "pack_id"]):
        total = grp["n_tokens"].sum()
        # greedy contiguous packing: a bin holds < budget before its last
        # doc, so it can overrun by at most that one document
        assert total < 256 + max_doc
    # consecutive pack ids within each shard (no gaps)
    for _, grp in out.groupby("shard"):
        ids = sorted(grp["pack_id"].unique())
        assert ids == list(range(len(ids)))
    # determinism under repartitioning
    out2 = pack_sequences(toks.repartition(13), budget=256, n_shards=8).toPandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert (a["pack_id"] == b["pack_id"]).all() and (a["shard"] == b["shard"]).all()

    with pytest.raises(ValueError, match="positive"):
        pack_sequences(toks, budget=0)


def test_stratified_hash_sample_per_stratum_fractions(spark, sf_dir):
    from pangool_spark.operators.sampling import hash_sample, stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_hash_sample(docs, "doc_id", "lang", {"en": 0.2, "fr": 1.0})
    per_lang = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_lang.get("fr", 0) == totals.get("fr", 0)      # kept whole
    assert 0.05 < per_lang.get("en", 0) / totals["en"] < 0.4  # ~20%
    assert set(per_lang) <= {"en", "fr"}                      # others dropped
    # per-stratum choice agrees with the flat sampler at the same fraction
    flat = {r.doc_id for r in hash_sample(docs.filter(F.col("lang") == "en"), "doc_id", 0.2).collect()}
    strat = {r.doc_id for r in out.filter(F.col("lang") == "en").select("doc_id").collect()}
    assert flat == strat
    with pytest.raises(ValueError, match="must be in"):
        stratified_hash_sample(docs, "doc_id", "lang", {"en": 2.0})


def test_epoch_shuffle_deterministic_and_epoch_sensitive(spark):
    from pangool_spark.operators.sampling import epoch_shuffle

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id LONG, text STRING"
    )
    a1 = {(r.doc_id): (r.shard, r.pos) for r in epoch_shuffle(docs, "doc_id", 8, epoch=0).collect()}
    a2 = {(r.doc_id): (r.shard, r.pos) for r in epoch_shuffle(docs, "doc_id", 8, epoch=0).collect()}
    b = {(r.doc_id): (r.shard, r.pos) for r in epoch_shuffle(docs, "doc_id", 8, epoch=1).collect()}
    assert a1 == a2                        # rerun-stable
    assert a1 != b                         # epochs permute differently
    # dense per-shard positions starting at 1
    by_shard = {}
    for shard, pos in a1.values():
        by_shard.setdefault(shard, []).append(pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # repartitioning the input does not change the assignment
    c = {(r.doc_id): (r.shard, r.pos) for r in epoch_shuffle(docs.repartition(7), "doc_id", 8, epoch=0).collect()}
    assert c == a1


def test_weighted_systematic_sample(spark):
    import random as _random

    from pyspark.sql import functions as F

    from pangool_spark.operators.sampling import weighted_systematic_sample

    rng = _random.Random(13)
    rows = [(i, rng.randint(0, 100)) for i in range(300)]
    df = spark.createDataFrame(rows, "k LONG, w LONG")
    n = 40
    got = {r.k: r.n_points for r in
           weighted_systematic_sample(df, ["k"], "w", n).collect()}
    # python reference: systematic points k*W/n over cumulative weights
    W = sum(w for _, w in rows)
    run, want = 0, {}
    for k, w in sorted(rows):
        a, run = run, run + w
        pts = (run * n) // W - (a * n) // W
        if pts >= 1:
            want[k] = pts
    assert got == want
    assert sum(got.values()) == n  # the points partition exactly
    # zero-weight rows never selected; heavy rows always
    assert all(w > 0 for k, w in rows if k in got)
    heavy = spark.createDataFrame(rows + [(999, 10_000)], "k LONG, w LONG")
    hs = {r.k for r in weighted_systematic_sample(heavy, ["k"], "w", 20).collect()}
    assert 999 in hs
    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-negative"):
        weighted_systematic_sample(
            spark.createDataFrame([(1, -5)], "k LONG, w LONG"), ["k"], "w", 3
        )
    with _pytest.raises(ValueError, match="integer-typed"):
        weighted_systematic_sample(
            spark.createDataFrame([(1, 0.5)], "k LONG, w DOUBLE"), ["k"], "w", 3
        )
    # all-zero weights -> empty, schema intact
    z = weighted_systematic_sample(
        spark.createDataFrame([(1, 0), (2, 0)], "k LONG, w LONG"), ["k"], "w", 3
    )
    assert z.count() == 0 and z.columns == ["k", "w", "n_points"]
