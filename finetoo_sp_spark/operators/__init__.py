from finetoo_sp_spark.operators.primitives import (
    PropertyGraphFrames,
    op_aggregate,
    op_compare,
    op_filter,
    op_group_by,
    op_join,
    op_match,
    op_project,
    op_traverse,
)

__all__ = [
    "PropertyGraphFrames",
    "op_match",
    "op_filter",
    "op_compare",
    "op_traverse",
    "op_aggregate",
    "op_group_by",
    "op_project",
    "op_join",
]
