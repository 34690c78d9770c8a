from .registry import ANALYTICS_QUERIES, QuerySpec, load_table

__all__ = ["ANALYTICS_QUERIES", "QuerySpec", "load_table"]
