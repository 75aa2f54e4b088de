"""negative_sample: deterministic hash-walk negative sampling."""

import hashlib

import pytest

from pangool_spark.operators.sampling import negative_sample


def _h31(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) & 0x7FFFFFFF


def _py_negatives(pos, item_list, n_neg, tries_factor):
    items = sorted(set(item_list))
    n = len(items)
    out = {}
    for u in sorted({p[0] for p in pos}):
        owned = {i for (uu, i) in pos if uu == u}
        picked = []
        for t in range(n_neg * tries_factor):
            it = items[_h31(f"{u}:{t}") % n]
            if it in owned or it in picked:
                continue
            picked.append(it)
            if len(picked) == n_neg:
                break
        out[u] = picked
    return out


def test_matches_python_reference_walk(spark):
    pos = [(1, 10), (1, 20), (1, 30), (2, 10), (3, 40), (3, 50)]
    items = [10, 20, 30, 40, 50, 60, 70, 80]
    pdf = spark.createDataFrame(pos, "user_id bigint, item_id bigint")
    idf = spark.createDataFrame([(i,) for i in items], "item_id bigint")
    got = {}
    for r in negative_sample(pdf, idf, n_neg=3, tries_factor=4).collect():
        got.setdefault(r.user_id, []).append((r.neg_rank, r.item_id))
    got = {u: [i for _, i in sorted(v)] for u, v in got.items()}
    assert got == _py_negatives(pos, items, 3, 4)


def test_negatives_never_collide_with_positives(spark):
    pos = [(u, i) for u in range(6) for i in range(0, 40, 2)]  # evens owned
    pdf = spark.createDataFrame(pos, "user_id bigint, item_id bigint")
    idf = spark.createDataFrame([(i,) for i in range(40)], "item_id bigint")
    out = negative_sample(pdf, idf, n_neg=5, tries_factor=6).collect()
    owned = {(u, i) for u, i in pos}
    assert out, "expected some negatives"
    for r in out:
        assert (r.user_id, r.item_id) not in owned
        assert r.item_id % 2 == 1  # only odds are non-positive


def test_exhaustion_underfills_deterministically(spark):
    # universe of 3, user owns 2 -> at most 1 negative regardless of tries
    pdf = spark.createDataFrame([(7, 100), (7, 101)], "user_id bigint, item_id bigint")
    idf = spark.createDataFrame([(100,), (101,), (102,)], "item_id bigint")
    out = negative_sample(pdf, idf, n_neg=5, tries_factor=10).collect()
    assert [(r.user_id, r.item_id, r.neg_rank) for r in out] == [(7, 102, 1)]


def test_validation(spark):
    pdf = spark.createDataFrame([(1, 2)], "user_id bigint, item_id bigint")
    idf = spark.createDataFrame([(2,)], "item_id bigint")
    with pytest.raises(ValueError):
        negative_sample(pdf, idf, n_neg=0)
    with pytest.raises(ValueError):
        negative_sample(pdf, idf, n_neg=1, tries_factor=0)
