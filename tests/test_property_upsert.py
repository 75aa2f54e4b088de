"""Property-based cross-validation of the snapshot-maintenance operators
against pure-Python dict semantics on random key/version streams."""

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st

from pangool_spark.operators.upsert import keep_latest, merge_upsert, scd2_history


@st.composite
def base_and_updates(draw):
    base = {
        k: draw(st.integers(0, 100))
        for k in draw(st.sets(st.integers(0, 15), max_size=8))
    }
    updates = {
        k: draw(st.integers(0, 100))
        for k in draw(st.sets(st.integers(0, 20), max_size=8))
    }
    return base, updates


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(base_and_updates())
def test_merge_upsert_matches_dict_update(spark, bu):
    base, updates = bu
    expected = {**base, **updates}
    if not base and not updates:
        return
    bdf = spark.createDataFrame(list(base.items()) or [(None, None)], "k LONG, v LONG")
    udf = spark.createDataFrame(list(updates.items()) or [(None, None)], "k LONG, v LONG")
    if not base:
        bdf = bdf.filter("k IS NOT NULL")
    if not updates:
        udf = udf.filter("k IS NOT NULL")
    got = {r.k: r.v for r in merge_upsert(bdf, udf, ["k"]).collect()}
    assert got == expected


@st.composite
def version_stream(draw):
    n = draw(st.integers(1, 30))
    seen = set()
    rows = []
    for _ in range(n):
        k = draw(st.integers(0, 5))
        t = draw(st.integers(0, 50))
        if (k, t) in seen:
            continue
        seen.add((k, t))
        rows.append((k, t, draw(st.integers(0, 9))))
    return rows


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(version_stream())
def test_keep_latest_and_scd2_match_python(spark, rows):
    rows = rows or [(0, 0, 0)]
    df = spark.createDataFrame(rows, "k LONG, ts LONG, v LONG")

    latest = {}
    for k, t, v in rows:
        if k not in latest or t > latest[k][0]:
            latest[k] = (t, v)
    got = {r.k: (r.ts, r.v) for r in keep_latest(df, ["k"], ["ts"]).collect()}
    assert got == latest

    by_key = {}
    for k, t, v in rows:
        by_key.setdefault(k, []).append((t, v))
    expected = {}
    for k, versions in by_key.items():
        versions.sort()
        for i, (t, v) in enumerate(versions):
            nxt = versions[i + 1][0] if i + 1 < len(versions) else None
            expected[(k, t)] = (v, nxt, nxt is None)
    hist = {
        (r.k, r.valid_from): (r.v, r.valid_to, r.is_current)
        for r in scd2_history(df, ["k"], "ts").collect()
    }
    assert hist == expected


def test_golden_record_field_level_survivorship(spark):
    import pytest

    from pangool_spark.operators.upsert import golden_record

    rows = [
        # cluster 1: name only in v1, seg only in v2, bal in both
        (1, 1, "alice", None, 100),
        (1, 2, None, "AUTO", 200),
        # cluster 2: every field NULL in the winner; falls back per field
        (2, 1, "bob", "SEG", 50),
        (2, 2, None, None, None),
        # cluster 3: singleton
        (3, 1, None, "X", None),
    ]
    df = spark.createDataFrame(
        rows, "k long, ver int, name string, seg string, bal long"
    )
    got = {
        r["k"]: (r["n_members"], r["name"], r["seg"], r["bal"])
        for r in golden_record(df, "k", ["name", "seg", "bal"], ["ver"]).collect()
    }
    assert got == {
        1: (2, "alice", "AUTO", 200),  # mixed-version golden record
        2: (2, "bob", "SEG", 50),      # v2 all-null -> v1 survives per field
        3: (1, None, "X", None),
    }
    with pytest.raises(ValueError, match="fields"):
        golden_record(df, "k", [], ["ver"])
    with pytest.raises(ValueError, match="order_by"):
        golden_record(df, "k", ["name"], [])
