"""Approximate string joins: lossless q-gram + length-band blocking."""

import pytest
from pyspark.sql import functions as F

from pangool_spark.operators.fuzzy import edit_distance_join, edit_distance_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_basic(spark):
    rows = [
        (1, "small ring"),
        (2, "small rink"),     # d=1 from 1
        (3, "smalls ring"),    # d=1 from 1
        (4, "red widget"),
        (5, "red midget"),     # d=1 from 4
        (6, "wholly unrelated string"),
    ]
    df = spark.createDataFrame(rows, "id LONG, text STRING")
    got = {
        (r.id_a, r.id_b): r.distance
        for r in edit_distance_pairs(df, "id", "text", max_d=1).collect()
    }
    assert got == {(1, 2): 1, (1, 3): 1, (4, 5): 1}


def test_short_strings_with_no_shared_gram_still_match(spark):
    # "ab" vs "cd": distance 2, zero shared 3-grams — the q-gram lemma's
    # bound is <= 0 here, so only the length-band path can find the pair
    df = spark.createDataFrame(
        [(1, "ab"), (2, "cd"), (3, "abcdefghijkl")], "id LONG, text STRING"
    )
    got = {
        (r.id_a, r.id_b): r.distance
        for r in edit_distance_pairs(df, "id", "text", max_d=2).collect()
    }
    assert got == {(1, 2): 2}


def test_edit_distance_join_cross_relation(spark):
    a = spark.createDataFrame([(1, "alpha"), (2, "gamma")], "id LONG, name STRING")
    b = spark.createDataFrame(
        [(1, "alphq"), (9, "gamma"), (8, "nothing close here")],
        "id LONG, name STRING",
    )
    got = {
        (r.id_a, r.id_b): r.distance
        for r in edit_distance_join(a, b, "id", "name", "id", "name", max_d=1).collect()
    }
    # same-side pairs excluded; id collision (1 vs 1) handled structurally
    assert got == {(1, 1): 1, (2, 9): 0}


def test_edit_distance_pairs_matches_bruteforce_random(spark):
    import random

    rng = random.Random(11)
    alphabet = "abc"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id LONG, text STRING")
    for d in (1, 2):
        got = {
            (r.id_a, r.id_b): r.distance
            for r in edit_distance_pairs(df, "id", "text", max_d=d).collect()
        }
        want = {}
        for i, (ia, sa) in enumerate(rows):
            for ib, sb in rows[i + 1 :]:
                dist = _lev(sa, sb)
                if dist <= d:
                    want[(ia, ib)] = dist
        assert got == want, f"max_d={d}"


def test_edit_distance_pairs_plan_has_no_cross_join(spark, sf_dir):
    """The whole point: candidates come from equi-joins (gram hash /
    length band), never a cartesian product, and verification is the JVM
    levenshtein — no Python evaluator."""
    from pangool_spark.data import load_table

    part = load_table(spark, sf_dir, "part")
    plan = (
        edit_distance_pairs(part, "p_partkey", "p_name", max_d=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_edit_distance_pairs_validates_params(spark):
    df = spark.createDataFrame([(1, "x")], "id LONG, text STRING")
    with pytest.raises(ValueError, match="max_d"):
        edit_distance_pairs(df, max_d=-1)
    with pytest.raises(ValueError, match="q must"):
        edit_distance_pairs(df, q=1)


def test_deletion_and_gram_strategies_agree(spark):
    """Both lossless blockings must produce IDENTICAL pair sets at d<=1
    (auto picks deletion there; gram stays the d>=2 / long-text path).
    Includes empty strings, duplicates, and 1-char strings — the deletion
    variants' edge cases (identity-of-empty, delete-to-empty)."""
    import random

    rng = random.Random(23)
    rows = [(0, ""), (1, "a"), (2, "a"), (3, "b"), (4, "ab")] + [
        (i, "".join(rng.choice("abcd") for _ in range(rng.randint(1, 10))))
        for i in range(5, 70)
    ]
    df = spark.createDataFrame(rows, "id LONG, text STRING")
    for d in (0, 1):
        got_del = {
            (r.id_a, r.id_b): r.distance
            for r in edit_distance_pairs(df, "id", "text", max_d=d, strategy="deletion").collect()
        }
        got_gram = {
            (r.id_a, r.id_b): r.distance
            for r in edit_distance_pairs(df, "id", "text", max_d=d, strategy="gram").collect()
        }
        assert got_del == got_gram, f"max_d={d}"
    with pytest.raises(ValueError, match="deletion"):
        edit_distance_pairs(df, "id", "text", max_d=2, strategy="deletion")


def test_repeated_gram_pairs_survive_count_filter(spark):
    """r07 advice regression: the Gravano count filter must count shared
    grams with MULTIPLICITY. Strings with repeated grams have fewer
    DISTINCT grams than |s|-q+1, so a distinct-gram count undercuts the
    positional bound and wrongly pruned true pairs like
    ('aaaaaaaa','aaabaaaa') at d=1 and length-12 d=2 pairs on the
    default auto path."""
    import itertools

    rows = [
        (1, "aaaaaaaa"),
        (2, "aaabaaaa"),  # ed=1, only 2 vs 3 distinct 3-grams
        (3, "abababababab"),
        (4, "abababcbabab"),  # ed=1 on a 2-period string
        (5, "aaaaaabbaaaa"),
        (6, "aaaaaaaaaaaa"),
        (7, "aabaaabaaaaa"),  # ed=2 vs id 6, length 12
    ]
    df = spark.createDataFrame(rows, "id LONG, text STRING")
    # brute-force reference: JVM levenshtein on the full cross join
    ref = (
        df.alias("x")
        .crossJoin(df.alias("y"))
        .where("x.id < y.id")
        .selectExpr(
            "x.id AS id_a", "y.id AS id_b", "levenshtein(x.text, y.text) AS d"
        )
        .collect()
    )
    for d in (1, 2):
        want = {(r.id_a, r.id_b): r.d for r in ref if r.d <= d}
        for strat in ("gram", "auto"):
            got = {
                (r.id_a, r.id_b): r.distance
                for r in edit_distance_pairs(
                    df, "id", "text", max_d=d, strategy=strat
                ).collect()
            }
            assert got == want, f"max_d={d} strategy={strat}: {got} != {want}"


def test_deletion_strategy_plan_is_equi_join_only(spark, sf_dir):
    """The deletion path too: candidates from variant-hash equi-joins,
    JVM levenshtein verify, no cartesian, no Python."""
    from pangool_spark.data import load_table

    part = load_table(spark, sf_dir, "part")
    plan = (
        edit_distance_pairs(part, "p_partkey", "p_name", max_d=1, strategy="deletion")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_best_match_join_resolution(spark):
    from pangool_spark.operators.fuzzy import best_match_join

    a = spark.createDataFrame(
        [(1, "smith"), (2, "jonez"), (3, "zzzzz")], "id bigint, name string"
    )
    b = spark.createDataFrame(
        [(10, "smyth"), (11, "smite"), (12, "jones")], "id bigint, name string"
    )
    got = {
        r.id_a: (r.id_b, r.distance)
        for r in best_match_join(a, b, "id", "name", "id", "name", max_d=2).collect()
    }
    # smith: smyth(1) and smite(1) tie at d=1 -> lowest ref id 10 wins
    # jonez -> jones d=1; zzzzz unmatched -> absent
    assert got == {1: (10, 1), 2: (12, 1)}
