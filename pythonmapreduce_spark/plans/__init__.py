from pythonmapreduce_spark.plans.registry import QUERIES, ORACLES, register, query_names

__all__ = ["QUERIES", "ORACLES", "register", "query_names"]
