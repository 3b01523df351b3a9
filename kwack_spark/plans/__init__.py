from kwack_spark.plans.registry import QUERIES, oracle_map, query_map, register

__all__ = ["QUERIES", "register", "query_map", "oracle_map"]
