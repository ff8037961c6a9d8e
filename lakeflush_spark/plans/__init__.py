from lakeflush_spark.plans.queries import QUERIES, DeclaredQuery

__all__ = ["QUERIES", "DeclaredQuery"]
