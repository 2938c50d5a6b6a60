from defenda_data_lake_spark.functions.compat import register_compat_functions

__all__ = ["register_compat_functions"]
