from .hive_compat import (
    davg,
    dsum,
    hive_if,
    nvl,
    exact_sum_expr,
)

__all__ = ["dsum", "davg", "nvl", "hive_if", "exact_sum_expr"]
