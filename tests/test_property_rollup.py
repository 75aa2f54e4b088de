"""Property-based invariants for the vectorized rollup callback walk:
for ANY grouped dataset, opens/closes balance per depth, every row is
delivered exactly once, and per-base-group event counts match the number
of distinct sub-groups (RollupReducer.java:129-202 contract)."""

from hypothesis import given, settings, strategies as st

from pangool_spark.plans import JobBuilder
from pangool_spark.plans.job import RollupReducer


class Recorder(RollupReducer):
    def on_open_group(self, depth, field, row, collector):
        collector.write({"e": f"O{depth}:{row[field]}"})

    def on_close_group(self, depth, field, row, collector):
        collector.write({"e": f"C{depth}:{row[field]}"})

    def on_group_elements(self, group, rows, collector):
        for _ in range(len(rows)):
            collector.write({"e": "ELEM"})


rows_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 2), st.integers(0, 100)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(rows=rows_strategy)
def test_rollup_walk_invariants(spark, rows):
    df = spark.createDataFrame(rows, "a INT, b INT, v INT")
    jb = (
        JobBuilder(spark, "prop_rollup")
        .add_input(df, "a:int,b:int,v:int")
        .set_group_by("a", "b")
        .set_rollup_from("a")
        .set_rollup_reducer(Recorder(), "e:string")
    )
    events = [r.e for r in jb.to_dataframe().collect()]

    n_elem = sum(1 for e in events if e == "ELEM")
    assert n_elem == len(rows)  # every row delivered exactly once

    distinct_a = {a for a, _, _ in rows}
    distinct_ab = {(a, b) for a, b, _ in rows}
    for depth, expected in ((0, len(distinct_a)), (1, len(distinct_ab))):
        opens = sum(1 for e in events if e.startswith(f"O{depth}:"))
        closes = sum(1 for e in events if e.startswith(f"C{depth}:"))
        assert opens == closes == expected, (depth, opens, closes, expected)
