"""Property sweeps for the round-7 operators: line_dedup and dataset_diff
against pure-Python references on random inputs, salted_join against the
plain join."""

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st


def python_line_dedup(docs, min_docs=2):
    """Reference: remove lines whose trimmed content occurs in >= min_docs
    distinct docs; blank lines kept and never counted."""
    holders = {}
    for did, text in docs:
        for line in set(l.strip() for l in text.split("\n")):
            if line:
                holders.setdefault(line, set()).add(did)
    hot = {l for l, ds in holders.items() if len(ds) >= min_docs}
    out = {}
    for did, text in docs:
        kept = [l for l in text.split("\n") if l.strip() == "" or l.strip() not in hot]
        out[did] = "\n".join(kept)
    return out


@st.composite
def doc_sets(draw):
    lines = ["alpha", "beta beta", "gamma", " padded ", "delta"]
    n = draw(st.integers(1, 6))
    docs = []
    for i in range(n):
        k = draw(st.integers(0, 4))
        docs.append((i, "\n".join(draw(st.sampled_from(lines + [""])) for _ in range(k))))
    return docs


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(doc_sets(), st.integers(2, 3))
def test_line_dedup_matches_python_reference(spark, docs, min_docs):
    from pangool_spark.operators.text import line_dedup

    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {r.doc_id: r.text for r in line_dedup(df, min_docs=min_docs).collect()}
    assert got == python_line_dedup(docs, min_docs)


def python_diff(old, new):
    out = {}
    o = {r[0]: r[1:] for r in old}
    n = {r[0]: r[1:] for r in new}
    for k in o.keys() | n.keys():
        if k not in n:
            out[k] = "removed"
        elif k not in o:
            out[k] = "added"
        elif o[k] != n[k]:
            out[k] = "changed"
    return out


@st.composite
def snapshots(draw):
    keys = draw(st.lists(st.integers(0, 9), unique=True, min_size=0, max_size=8))
    vals = st.one_of(st.none(), st.integers(0, 3))
    old = [(k, draw(vals), draw(vals)) for k in keys]
    keys2 = draw(st.lists(st.integers(0, 9), unique=True, min_size=0, max_size=8))
    new = [(k, draw(vals), draw(vals)) for k in keys2]
    return old, new


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(snapshots())
def test_dataset_diff_matches_python_reference(spark, snaps):
    from pangool_spark.operators.upsert import dataset_diff

    old, new = snaps
    schema = "k LONG, a INT, b INT"
    df_o = spark.createDataFrame(old, schema) if old else spark.createDataFrame([], schema)
    df_n = spark.createDataFrame(new, schema) if new else spark.createDataFrame([], schema)
    got = {r.k: r.status for r in dataset_diff(df_o, df_n, ["k"]).collect()}
    assert got == python_diff(old, new)


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 99)), min_size=0, max_size=30),
    st.lists(st.integers(0, 5), unique=True, min_size=0, max_size=5),
    st.sampled_from(["inner", "left"]),
)
def test_salted_join_property(spark, big_rows, small_keys, how):
    from pangool_spark.operators.partitioning import salted_join

    big_rows = (big_rows or [(99, 0)]) + [(None, 777)]  # null join key
    big = spark.createDataFrame(big_rows, "k LONG, v LONG")
    small = spark.createDataFrame(
        [(k, f"n{k}") for k in small_keys] or [(98, "x")], "k LONG, name STRING"
    )
    got = salted_join(big, small, ["k"], n_salts=4, how=how)
    want = big.join(small, ["k"], how)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
