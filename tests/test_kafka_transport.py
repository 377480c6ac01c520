"""Transport-layer contract tests for the gated Kafka path (r10
verdict #8): exercise read_kafka_stream / write_kafka_stream's CONFIG
ASSEMBLY and ERROR SURFACE without a broker.

The record-shaping layer is unit-tested in tests/test_kafka.py on
static frames; these tests pin what that file cannot — that the
transport functions hand the Spark kafka source exactly the options
the reference's consumer/producer config maps to
(dsl/PriceAlertsApp.java:74 bootstrap, :87-90 subscribe, :134 sink
topic + checkpoint ≡ application id/state dir), and that a jar-less
environment surfaces the documented RuntimeError hint instead of a
raw ClassNotFound. A recorder stands in for the reader/writer chain;
its load() returns a real static frame with the kafka wire schema so
the decode projection downstream of the transport is exercised too.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kafka_streams_homework_spark.sources.kafka import (
    read_kafka_stream,
    write_kafka_stream,
)


class _ReaderRecorder:
    """Stands in for spark.readStream: records format/options, serves
    a static frame with the kafka source's wire schema from load()."""

    def __init__(self, spark):
        self.spark = spark
        self.fmt = None
        self.options: dict[str, str] = {}

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.options[k] = v
        return self

    def load(self):
        return self.spark.createDataFrame(
            [(b"k1", b'{"price": 7.5}', None)],
            "key binary, value binary, timestamp timestamp",
        )


def test_read_kafka_stream_config_assembly(spark, monkeypatch):
    rec = _ReaderRecorder(spark)
    monkeypatch.setattr(
        SparkSession, "readStream", property(lambda self: rec)
    )
    out = read_kafka_stream(
        spark,
        "broker1:9092,broker2:9092",
        "purchases",
        json_value_schema="price double",
        starting_offsets="latest",
    )
    assert rec.fmt == "kafka"
    assert rec.options == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "purchases",
        "startingOffsets": "latest",
    }
    # the decode projection ran downstream of the transport
    assert out.columns == ["key", "value", "ts"]
    row = out.collect()[0]
    assert row.key == "k1" and row.value.price == 7.5


class _WriterRecorder:
    """Stands in for payload.writeStream: records format/options/mode
    and the payload frame's schema; start() returns a sentinel."""

    captured: dict = {}

    def __init__(self, df):
        _WriterRecorder.captured = {"schema": df.schema.simpleString()}
        self.c = _WriterRecorder.captured

    def format(self, fmt):
        self.c["format"] = fmt
        return self

    def option(self, k, v):
        self.c.setdefault("options", {})[k] = v
        return self

    def outputMode(self, m):
        self.c["outputMode"] = m
        return self

    def start(self):
        self.c["started"] = True
        return "query-handle"


def test_write_kafka_stream_config_assembly(spark, monkeypatch):
    df = spark.createDataFrame([(1, 9.5)], "user_id long, total double")
    # patch the CONCRETE class (pyspark 4's classic DataFrame subclass
    # shadows the pyspark.sql.DataFrame property)
    monkeypatch.setattr(
        type(df), "writeStream", property(lambda self: _WriterRecorder(self))
    )
    handle = write_kafka_stream(
        df,
        "broker1:9092",
        "alerts",
        "/tmp/ckpt-alerts",
        key_col="user_id",
        value_expr=F.to_json(F.struct("total")),
        output_mode="update",
    )
    c = _WriterRecorder.captured
    assert handle == "query-handle" and c["started"]
    assert c["format"] == "kafka"
    assert c["options"] == {
        "kafka.bootstrap.servers": "broker1:9092",
        "topic": "alerts",
        "checkpointLocation": "/tmp/ckpt-alerts",
    }
    assert c["outputMode"] == "update"
    # Produced.with(String, ...) payload contract: exactly (key string, value)
    assert c["schema"] == "struct<key:string,value:string>"


def test_write_kafka_stream_gates_with_clear_error(spark):
    """Jar-less error surface for the SINK side (the read twin is
    pinned in tests/test_kafka.py): a genuine streaming frame driven
    at the kafka format must surface the documented hint, not a raw
    provider ClassNotFound."""
    stream = spark.readStream.format("rate").load()
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        write_kafka_stream(
            stream,
            "localhost:9092",
            "alerts",
            "/tmp/ckpt-gate-test",
            key_col="value",
            value_expr=F.col("value").cast("string"),
        )
