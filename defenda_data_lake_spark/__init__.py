"""defenda_data_lake_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ``0xdefendA/defenda-data-lake``.

The reference system is a serverless streaming-ETL + SQL-on-files stack
(Kinesis Firehose -> lambda plugin pipeline -> S3 NDJSON -> Athena/Presto).
This package re-expresses both halves Spark-first:

* ingestion/normalization -> Structured Streaming + an Arrow-batched
  plugin pipeline (``operators.pipeline`` / ``operators.plugins``);
* the delegated Presto SQL surface -> Spark SQL itself, plus thin
  compatibility aliases (``functions.compat``) so reference query text
  (``json_extract_scalar`` et al., reference README.md:89-136) runs verbatim.

Everything here is built on the public Apache Spark API only.
"""

from defenda_data_lake_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
