"""Operator library: the analytics the reference's examples implement,
exposed as first-class DataFrame → DataFrame operators, plus the
training-data-pipeline extensions (dedup, similarity, text, multimodal).
"""

from pangool_spark.operators.grouping import (
    grouped_agg,
    grouped_count,
    rollup_agg,
    cube_agg,
    secondary_sorted_apply,
    agg_state,
    merge_agg_states,
)
from pangool_spark.operators.joins import (
    cogroup_join,
    broadcast_join,
    semi_join,
    anti_join,
    bloom_prune_join,
)
from pangool_spark.operators.windows import (
    top_k,
    moving_average,
    normalize_by_group_total,
    lead_lag,
)

__all__ = [
    "grouped_agg",
    "grouped_count",
    "rollup_agg",
    "cube_agg",
    "secondary_sorted_apply",
    "agg_state",
    "merge_agg_states",
    "cogroup_join",
    "broadcast_join",
    "semi_join",
    "anti_join",
    "bloom_prune_join",
    "top_k",
    "moving_average",
    "normalize_by_group_total",
    "lead_lag",
]
