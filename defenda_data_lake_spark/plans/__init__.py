from defenda_data_lake_spark.plans.catalog import CATALOG, headline_queries

__all__ = ["CATALOG", "headline_queries"]
