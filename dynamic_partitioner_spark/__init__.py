"""PySpark-native engine with the capabilities of
``data-integrations/dynamic-partitioner`` (dynamic Hive-partitioned
Avro/ORC/Parquet sinks) plus LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis), designed for
100 TB scale.
"""

from .session import apply_engine_confs, get_spark
from .spec import CODECS, FORMATS, SinkSpec, SpecError
from .operators.partition_keys import normalize_partition_keys
from .operators.partitioned_write import (
    PartitionExistsError,
    STAGE_FIELD,
    list_existing_partitions,
    spark_avro_available,
    write_partitioned,
)
from .sources.read import read_partitioned, read_payload, read_table_view

__all__ = [
    "CODECS", "FORMATS", "SinkSpec", "SpecError", "PartitionExistsError",
    "STAGE_FIELD", "get_spark", "apply_engine_confs",
    "normalize_partition_keys", "write_partitioned",
    "list_existing_partitions", "spark_avro_available",
    "read_partitioned", "read_payload", "read_table_view",
]
