from .registry import ANALYTICS_QUERIES, QuerySpec, load_table
from . import tpch_more  # noqa: F401  (registers Q2/Q7-Q22 analogs)

__all__ = ["ANALYTICS_QUERIES", "QuerySpec", "load_table"]
