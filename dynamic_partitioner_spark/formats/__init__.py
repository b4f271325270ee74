from .avro_py import (avro_schema_json, decode_container, encode_container,
                      read_avro_partitioned, write_avro_partitioned)

__all__ = ["avro_schema_json", "decode_container", "encode_container",
           "read_avro_partitioned", "write_avro_partitioned"]
