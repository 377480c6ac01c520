"""Kafka-edge contract tests — broker-free (VERDICT r1 #6).

The transport needs the spark-sql-kafka jar (absent here), so these
tests pin (a) the gating error contract and (b) every record-shaping
step on static DataFrames with fabricated binary payloads — the same
frames the kafka source would produce (key/value binary + timestamp).
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from kafka_streams_homework_spark.sources.kafka import (
    KAFKA_PACKAGE_HINT,
    confluent_payload,
    confluent_schema_id,
    decode_kafka_records,
    kafka_sink_payload,
    read_kafka_stream,
)

RAW_SCHEMA = "key binary, value binary, timestamp timestamp"


def _raw_records(spark, values: list[bytes]):
    """A frame shaped like the kafka source's output (subset)."""
    from tests.conftest import ts

    return spark.createDataFrame(
        [(str(i).encode(), v, ts(5, i)) for i, v in enumerate(values)],
        RAW_SCHEMA,
    )


def _confluent_frame(schema_id: int, body: bytes) -> bytes:
    """Magic 0x00 + big-endian schema id + payload (the registry serde's
    wire format, reference dsl/PriceAlertsApp.java:33-37)."""
    return b"\x00" + struct.pack(">I", schema_id) + body


def test_read_kafka_stream_gates_with_clear_error(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        read_kafka_stream(spark, "localhost:9092", "purchases")


def test_confluent_wire_format_round_trip(spark):
    raw = _raw_records(
        spark,
        [_confluent_frame(7, b"hello"), _confluent_frame(1042, b"")],
    )
    got = raw.select(
        confluent_schema_id(F.col("value")).alias("sid"),
        confluent_payload(F.col("value")).alias("body"),
    ).collect()
    assert [(r.sid, bytes(r.body)) for r in got] == [(7, b"hello"), (1042, b"")]


def test_decode_kafka_records_raw_binary_projection(spark):
    """No decode requested: (key string, value binary, ts) — key cast
    from bytes, value untouched."""
    raw = _raw_records(spark, [b"\x01\x02", b"payload"])
    out = decode_kafka_records(raw)
    assert out.columns == ["key", "value", "ts"]
    assert dict(out.dtypes) == {"key": "string", "value": "binary", "ts": "timestamp"}
    rows = out.orderBy("key").collect()
    assert [r.key for r in rows] == ["0", "1"]
    assert bytes(rows[1].value) == b"payload"


def test_decode_kafka_records_json_value_path(spark):
    """The non-Avro decode: JSON bytes → typed struct, no extra jar."""
    raw = _raw_records(
        spark, [b'{"user_id": 1, "value": 99.5}', b'{"user_id": 2, "value": 1.0}']
    )
    out = decode_kafka_records(
        raw, json_value_schema="user_id long, value double"
    )
    rows = out.orderBy("key").collect()
    assert rows[0].value.user_id == 1 and rows[0].value.value == 99.5
    assert rows[1].value.user_id == 2


def test_decode_kafka_records_confluent_plus_json(spark):
    """Wire-format stripping composes with value decode."""
    raw = _raw_records(spark, [_confluent_frame(3, b'{"user_id": 9}')])
    out = decode_kafka_records(
        raw, json_value_schema="user_id long", confluent_wire_format=True
    )
    assert out.collect()[0].value.user_id == 9


def test_avro_decode_gates_with_clear_error_or_decodes(spark):
    """Avro path: either the spark-avro jar is present (decode works) or
    the error names the missing package and the workaround."""
    raw = _raw_records(spark, [b"\x02"])  # avro-encoded long 1 (zigzag)
    schema = '{"type": "record", "name": "r", "fields": [{"name": "v", "type": "long"}]}'
    try:
        decode_kafka_records(raw, avro_value_schema=schema).collect()
    except Exception as ex:  # noqa: BLE001 — jar-absent errors vary by layer:
        # RuntimeError from the import gate, or Spark's AnalysisException
        # (AVRO data source not loaded) at action time
        assert "avro" in str(ex).lower()


def test_kafka_sink_payload_contract(spark):
    """Sink frames must be exactly (key string, value) — the
    Produced.with(String, ...) layout the kafka sink requires."""
    df = spark.createDataFrame([(5, 160.0)], "user_id long, total double")
    out = kafka_sink_payload(
        df, "user_id", F.to_json(F.struct("user_id", "total"))
    )
    assert out.columns == ["key", "value"]
    assert dict(out.dtypes)["key"] == "string"
    row = out.collect()[0]
    assert row.key == "5" and '"total":160.0' in row.value


def test_kafka_shaped_stream_end_to_end(spark, tmp_path):
    """Everything but the socket: records shaped exactly like the kafka
    source's output (key/value binary + timestamp) flow through
    decode_kafka_records (JSON value path) into the alert pipeline, and
    produce the same result as the plain typed-column path."""
    import uuid

    from kafka_streams_homework_spark.streaming import (
        price_alerts_stream,
        run_to_memory,
    )
    from tests.conftest import ts

    rows = [(1, ts(5, 10), 100.0), (1, ts(5, 20), 60.0), (2, ts(5, 30), 10.0)]
    # serialize as kafka-wire records: value = JSON bytes
    wire = [
        (
            str(u).encode(),
            f'{{"user_id": {u}, "ts": "{t.isoformat()}", "value": {v}}}'.encode(),
            t,
        )
        for u, t, v in rows
    ]
    path = str(tmp_path / f"wire_{uuid.uuid4().hex[:8]}")
    spark.createDataFrame(wire, RAW_SCHEMA).coalesce(1).write.parquet(path)

    raw_stream = spark.readStream.schema(RAW_SCHEMA).parquet(path)
    decoded = decode_kafka_records(
        raw_stream, json_value_schema="user_id long, ts timestamp, value double"
    ).select("value.user_id", "value.ts", "value.value")
    dim = spark.createDataFrame([(1, "u1"), (2, "u2")], "c_custkey long, c_name string")
    alerts = run_to_memory(
        spark,
        price_alerts_stream(decoded, dim, mode="update"),
        f"wire_{uuid.uuid4().hex[:8]}",
        mode="update",
    ).collect()
    assert len(alerts) == 1  # only user 1 crosses 150 (160.0)
    assert alerts[0].alert_key == "1"
    assert alerts[0].total_sum_per_minute == 160.0
