"""Sources and sinks.

The reference ships only an in-memory generator and a logging sink
(S1/S4, SURVEY.md §2.1), with Pub/Sub & BigQuery named as production
swap-ins. Here the source surface is Spark's native connector stack —
including the message-bus (Kafka-shaped) ingestion path — plus the
storage layout that makes 100 TB queryable.
"""

from data_timeseries_java_spark.sources.message_bus import (
    encode_bus_records,
    kafka_tick_stream,
    parse_bus_records,
    replay_bus_capture,
)
from data_timeseries_java_spark.sources.readers import (
    read_ticks_csv,
    read_ticks_json,
    read_ticks_parquet,
    stream_ticks_files,
)
from data_timeseries_java_spark.sources.writers import (
    write_partitioned_ticks,
    write_results,
)

__all__ = [
    "encode_bus_records",
    "kafka_tick_stream",
    "parse_bus_records",
    "read_ticks_csv",
    "read_ticks_json",
    "read_ticks_parquet",
    "replay_bus_capture",
    "stream_ticks_files",
    "write_partitioned_ticks",
    "write_results",
]
