from .registry import QUERIES, QuerySpec, bench_queries, oracle_sql_map, query_map

__all__ = ["QUERIES", "QuerySpec", "bench_queries", "oracle_sql_map", "query_map"]
