from .steps import Step, apply_step, apply_tpath, step_from_dict
from .relational import (
    group_count,
    group_sum,
    nominalize,
    order_by,
    rank_first,
    rid_concat,
    top_k,
)

__all__ = [
    "Step",
    "apply_step",
    "apply_tpath",
    "step_from_dict",
    "group_count",
    "group_sum",
    "nominalize",
    "order_by",
    "rank_first",
    "rid_concat",
    "top_k",
]
