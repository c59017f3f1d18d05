from .registry import QUERIES, QuerySpec, all_oracle_sql, all_queries, query

__all__ = ["QUERIES", "QuerySpec", "all_oracle_sql", "all_queries", "query"]
