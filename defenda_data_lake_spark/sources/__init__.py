"""Streaming source adapters.

Every adapter yields a *streaming* DataFrame with a ``raw`` string
column (one JSON event or blob per row) and optionally a ``source``
string column (intake tag); the ingest pipeline
(``streaming.ingest.start_ingest``) consumes that contract without
caring where records come from.
"""

from defenda_data_lake_spark.sources.file_landing import FileLandingSource
from defenda_data_lake_spark.sources.kafka import KafkaSource
from defenda_data_lake_spark.sources.kinesis import KinesisSource

__all__ = ["FileLandingSource", "KafkaSource", "KinesisSource"]
