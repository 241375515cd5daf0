from .registry import QUERIES, QuerySpec, load_table

__all__ = ["QUERIES", "QuerySpec", "load_table"]
