"""Message-bus tick ingestion: the production swap-in the reference
names (its README points the demo at a Pub/Sub topic as the intended
live source; here the equivalent is Kafka via Spark's built-in
connector).

Design: the WIRE FORMAT and the PARSE TRANSFORM are the contract. A
message-bus record is (key bytes, value bytes, bus timestamp); the
value payload is a JSON tick ``{"key": ..., "time": epoch_ms, "bid":
..., "ask": ...}``. ``parse_bus_records`` turns any DataFrame with that
wire shape — a real ``format("kafka")`` stream, a file-replayed capture,
a test fixture — into the engine tick schema. Every operator downstream
is source-agnostic, so the whole candle/correlation pipeline runs
unchanged off the bus.

The Kafka reader itself is a thin composition (``kafka_tick_stream``);
it needs a broker + the Kafka connector jar at runtime, so tests drive
the SAME parse transform through a file-replayed wire-format stream
with out-of-order delivery (tests/test_stream_sources.py).

CONTRACT-TEST BOUNDARY (stated explicitly): no test in this repo
executes against a live broker — the sandbox has neither a Kafka
broker nor the spark-sql-kafka connector jar, and the reference
likewise only *names* its bus (Pub/Sub in README.MD:23) without
integration-testing it. What IS tested is everything this repo owns:
the wire format, the parse transform (including malformed-payload
drops and out-of-order delivery), and stream==batch equivalence over
replayed captures. What is NOT is Spark's own Kafka connector config
(``format("kafka")`` options in ``kafka_tick_stream``) — a deployment
would cover that line with a testcontainers-style broker in its own
CI; everything downstream of the connector's (key, value, timestamp)
output shape is already exercised here.

Event time comes from the PAYLOAD (the tick's own timestamp), never the
bus ingestion timestamp — watermarks must follow trade time, or a
delayed producer would silently shift candles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# JSON payload carried in the bus record's value bytes
PAYLOAD_SCHEMA = "key string, time long, bid double, ask double"


def parse_bus_records(records: DataFrame) -> DataFrame:
    """Wire format → engine ticks. ``records`` needs Kafka's output
    shape: ``value binary`` (JSON tick payload); other bus columns
    (key, topic, partition, offset, timestamp) are ignored.

    Malformed payloads (unparseable JSON / missing fields) are dropped
    rather than poisoning the stream — from_json yields nulls, and the
    filter keeps the operator total. At 100 TB of feed history a
    dead-letter sink would replace the drop; the filter predicate is
    where it would hang."""
    payload = F.from_json(F.col("value").cast("string"), PAYLOAD_SCHEMA)
    return (records
            .select(payload.alias("p"))
            .where(F.col("p.key").isNotNull() & F.col("p.time").isNotNull())
            .select(
                F.col("p.key").alias("key"),
                F.timestamp_millis(F.col("p.time")).alias("event_time"),
                F.col("p.bid").alias("bid"),
                F.col("p.ask").alias("ask"),
                F.lit(True).alias("is_live"),
            ))


def kafka_tick_stream(spark: SparkSession, bootstrap_servers: str,
                      topic: str,
                      starting_offsets: str = "latest") -> DataFrame:
    """Live tick stream from a Kafka topic (production entry point;
    requires the spark-sql-kafka connector on the classpath — gated
    below with a fail-fast probe so a missing jar surfaces as one
    actionable error at call time, not a DataSource resolution stack
    trace at stream start). Everything downstream of the connector's
    (key, value, timestamp) shape is covered by the replayed-capture
    tests; the connector config line itself is the documented
    untested boundary (module docstring)."""
    # Resolve through Spark's context classloader, NOT py4j's system
    # classloader: jars added via spark.jars / spark.jars.packages live
    # in Spark's MutableURLClassLoader, which java.lang.Class.forName
    # (py4j-side) cannot see — probing there would raise even when
    # .format("kafka") works. Only a genuine ClassNotFoundException
    # counts as "connector missing"; any other Py4J error re-raises.
    jvm = spark.sparkContext._jvm
    try:
        (jvm.java.lang.Thread.currentThread().getContextClassLoader()
         .loadClass("org.apache.spark.sql.kafka010.KafkaSourceProvider"))
    except Exception as e:
        java_exc = getattr(e, "java_exception", None)
        is_cnf = java_exc is not None and "ClassNotFoundException" in (
            java_exc.getClass().getName())
        if not is_cnf:
            raise
        raise RuntimeError(
            "kafka_tick_stream needs the spark-sql-kafka-0-10 connector "
            "on the driver classpath (spark.jars.packages="
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>). "
            "For broker-less environments use replay_bus_capture, which "
            "drives the identical parse transform from captured "
            "wire-format files.") from e
    raw = (spark.readStream
           .format("kafka")
           .option("kafka.bootstrap.servers", bootstrap_servers)
           .option("subscribe", topic)
           .option("startingOffsets", starting_offsets)
           .load())
    return parse_bus_records(raw)


def encode_bus_records(ticks: DataFrame) -> DataFrame:
    """Engine ticks → wire format (key bytes, JSON value bytes) — the
    producer side, also used to build replay captures for tests."""
    payload = F.to_json(F.struct(
        F.col("key"),
        F.unix_millis(F.col("event_time")).alias("time"),
        F.col("bid"), F.col("ask")))
    return ticks.select(
        F.col("key").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
    )


def replay_bus_capture(spark: SparkSession, path: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """Stream a captured wire-format feed (parquet files of
    (key binary, value binary)) through the same parse transform the
    Kafka reader uses — out-of-order delivery comes from file order vs
    payload event time."""
    reader = spark.readStream.schema("key binary, value binary")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_bus_records(reader.parquet(path))
