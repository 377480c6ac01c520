"""Kafka source/sink wiring — the reference's native edges.

Reference: ``builder.stream(PURCHASE_TOPIC_NAME, Consumed.with(String,
avro))`` (dsl/PriceAlertsApp.java:87-90) and ``.to(RESULT_TOPIC,
Produced.with(...))`` (dsl:134); Avro values resolved against a Schema
Registry (dsl:33-37).

Spark twin: the kafka data source (``spark-sql-kafka`` package) +
``from_avro``/``to_avro`` (``pyspark.sql.avro.functions``). Neither a
broker nor the kafka jars exist in this container, so these builders
are import-gated: they construct the plan when the environment has the
package and raise a clear error otherwise. The batch parquet path
(sources/batch.py) is the tested twin; tests exercise the streaming
semantics through file sources instead (tests/test_streaming.py).

Schema note: we use static StructType/Avro-literal schemas instead of
a registry — Spark's from_avro takes the schema as a JSON string; a
Confluent registry integration would strip the 5-byte wire-format
prefix first (documented here for operators deploying against one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    avro_value_schema: str | None = None,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """KStream twin: subscribe a topic as a streaming DataFrame.

    Returns (key string, value, ts) — value decoded from Avro when a
    schema is given, else left as the raw binary column.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    out = raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value"),
        F.col("timestamp").alias("ts"),
    )
    if avro_value_schema is not None:
        try:
            from pyspark.sql.avro.functions import from_avro
        except ImportError as ex:  # pragma: no cover
            raise RuntimeError(
                "spark-avro package not available; pass avro_value_schema=None "
                "and decode downstream, or submit with --packages "
                "org.apache.spark:spark-avro_2.13:<spark-version>"
            ) from ex
        out = out.select(
            "key", from_avro(F.col("value"), avro_value_schema).alias("value"), "ts"
        )
    return out


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
    key_col: str,
    value_expr: F.Column,
    output_mode: str = "update",
):
    """Kafka sink twin (dsl:134): keyed writes to a result topic.

    checkpoint_location ≡ the reference's application id + state dir
    (STATE_DIR_CONFIG, dsl:77) — restart resumes exactly-once from it.
    """
    payload = df.select(
        F.col(key_col).cast("string").alias("key"), value_expr.alias("value")
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
        .outputMode(output_mode)
        .start()
    )
