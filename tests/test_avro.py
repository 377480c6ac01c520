"""Avro binary codec tests — spec vectors, round-trips, Spark parity.

The reference consumes Avro values via a Schema-Registry serde
(dsl/PriceAlertsApp.java:33-37, 84-85). With no spark-avro jar in the
container, sources/avro_codec.py implements the public Avro binary
spec in Python; these tests pin it against the spec's own published
examples (not just self-round-trip) and drive the full Confluent-wire
round-trip through Spark — NOT skipped.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from kafka_streams_homework_spark.sources import avro_codec as C

SCHEMA = """
{"type": "record", "name": "Purchase", "fields": [
  {"name": "user_id", "type": "long"},
  {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
  {"name": "value", "type": "double"},
  {"name": "note", "type": ["null", "string"]},
  {"name": "flag", "type": "boolean"},
  {"name": "blob", "type": ["null", "bytes"]}
]}
"""


# ---------------------------------------------------------------------------
# Spec vectors (Avro specification, "Binary Encoding" examples)
# ---------------------------------------------------------------------------


def _enc_long(n: int) -> bytes:
    out = bytearray()
    C.write_long(out, n)
    return bytes(out)


def test_zigzag_varint_spec_vectors():
    # table straight from the Avro spec
    assert _enc_long(0) == b"\x00"
    assert _enc_long(-1) == b"\x01"
    assert _enc_long(1) == b"\x02"
    assert _enc_long(-2) == b"\x03"
    assert _enc_long(2) == b"\x04"
    assert _enc_long(-64) == b"\x7f"
    assert _enc_long(64) == b"\x80\x01"


def test_string_encoding_spec_vector():
    # spec: the string "foo" → long 3 then UTF-8 bytes
    fields = C.parse_schema(
        '{"type":"record","name":"r","fields":[{"name":"s","type":"string"}]}'
    )
    assert C.encode_record(fields, {"s": "foo"}) == b"\x06foo"


def test_long_boundaries_roundtrip():
    for n in (0, 1, -1, 2**62, -(2**62), 2**63 - 1, -(2**63), 12345678901234):
        raw = _enc_long(n)
        got, pos = C.read_long(raw, 0)
        assert (got, pos) == (n, len(raw))


# ---------------------------------------------------------------------------
# Record round-trip
# ---------------------------------------------------------------------------


def test_record_roundtrip_full():
    fields = C.parse_schema(SCHEMA)
    row = {
        "user_id": -987654321,
        "ts": 1700000000_000000,  # µs
        "value": 3.14159,
        "note": "héllo ∆",
        "flag": True,
        "blob": b"\x00\xff\x01",
    }
    buf = C.encode_record(fields, row)
    out = C.decode_record(fields, buf)
    assert out["user_id"] == row["user_id"]
    assert out["ts"] == pd.Timestamp(row["ts"], unit="us")
    assert math.isclose(out["value"], row["value"])
    assert out["note"] == row["note"]
    assert out["flag"] is True
    assert out["blob"] == row["blob"]


def test_record_roundtrip_nulls():
    fields = C.parse_schema(SCHEMA)
    row = {"user_id": 7, "ts": 0, "value": -0.5, "note": None, "flag": False,
           "blob": None}
    out = C.decode_record(fields, C.encode_record(fields, row))
    assert out["note"] is None and out["blob"] is None and out["flag"] is False


def test_trailing_bytes_rejected():
    fields = C.parse_schema(
        '{"type":"record","name":"r","fields":[{"name":"n","type":"long"}]}'
    )
    with pytest.raises(ValueError, match="trailing"):
        C.decode_record(fields, b"\x02\x00")


def test_spark_ddl():
    assert C.spark_ddl(SCHEMA) == (
        "user_id bigint, ts timestamp, value double, note string, "
        "flag boolean, blob binary"
    )


# ---------------------------------------------------------------------------
# Spark round-trip (Arrow-batched UDFs + the registered query)
# ---------------------------------------------------------------------------


def test_spark_avro_roundtrip(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 2.5, "a"), (2, -1.25, None), (3, 0.0, "z" * 100)],
        "user_id bigint, value double, note string",
    )
    schema = (
        '{"type":"record","name":"r","fields":['
        '{"name":"user_id","type":"long"},'
        '{"name":"value","type":"double"},'
        '{"name":"note","type":["null","string"]}]}'
    )
    wire = df.select(
        C.avro_encode_column(F.struct("user_id", "value", "note"), schema).alias("v")
    )
    back = wire.select(C.avro_decode_column(F.col("v"), schema).alias("r")).select(
        "r.*"
    )
    got = sorted(back.collect(), key=lambda r: r.user_id)
    want = sorted(df.collect(), key=lambda r: r.user_id)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_avro_wire_roundtrip_matches_flagship(spark, sf_dir):
    """The Avro round-trip query equals the plain flagship — byte-level
    serde parity, same oracle as kafka_wire_roundtrip."""
    from kafka_streams_homework_spark import queries as Q

    reg = Q.queries()
    avro = reg["avro_wire_roundtrip"](spark, sf_dir).collect()
    plain = reg["price_alerts"](spark, sf_dir).collect()
    key = lambda r: (r.alert_key, r.window_start)
    assert sorted([tuple(r) for r in avro], key=lambda t: (t[0], t[2])) == sorted(
        [tuple(r) for r in plain], key=lambda t: (t[0], t[2])
    )


# ---------------------------------------------------------------------------
# Property-based round-trip (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_record = st.fixed_dictionaries(
    {
        "user_id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "ts": st.integers(min_value=0, max_value=4_102_444_800_000_000),  # ≤ y2100 µs
        "value": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "note": st.one_of(st.none(), st.text(max_size=200)),
        "flag": st.booleans(),
        "blob": st.one_of(st.none(), st.binary(max_size=200)),
    }
)


@settings(max_examples=300, deadline=None)
@given(_record)
def test_record_roundtrip_property(row):
    """Any record of the test schema survives encode→decode exactly
    (including negative longs, unicode, NaN-free doubles, None unions,
    empty strings/bytes)."""
    fields = C.parse_schema(SCHEMA)
    out = C.decode_record(fields, C.encode_record(fields, row))
    assert out["user_id"] == row["user_id"]
    assert out["ts"] == pd.Timestamp(row["ts"], unit="us")
    assert out["value"] == row["value"] or (
        out["value"] == 0.0 and row["value"] == 0.0  # -0.0 == 0.0
    )
    assert out["note"] == row["note"]
    assert out["flag"] is row["flag"]
    assert out["blob"] == row["blob"]


# ---------------------------------------------------------------------------
# Schema resolution (spec §Schema Resolution)
# ---------------------------------------------------------------------------

WRITER_V1 = """
{"type": "record", "name": "P", "fields": [
  {"name": "user_id", "type": "long"},
  {"name": "note", "type": "string"},
  {"name": "value", "type": "int"},
  {"name": "legacy", "type": "string"}
]}
"""

READER_V2 = """
{"type": "record", "name": "P", "fields": [
  {"name": "value", "type": "double"},
  {"name": "user_id", "type": "long"},
  {"name": "region", "type": "string", "default": "unknown"},
  {"name": "note", "type": "bytes"},
  {"name": "opt", "type": ["null", "long"]}
]}
"""


def test_schema_resolution_defaults_promotion_skip_reorder():
    """One record exercises the full resolution matrix: field
    reordering (name-based match), int->double promotion,
    string->bytes promotion, writer-only field skipped (but its bytes
    consumed), reader-only field from default, nullable reader-only
    field without default -> null."""
    w = C.parse_schema(WRITER_V1)
    buf = C.encode_record(
        w, {"user_id": 7, "note": "héllo", "value": -3, "legacy": "drop me"}
    )
    plan = C.ResolvedSchema(WRITER_V1, READER_V2)
    out = C.decode_record_resolved(plan, buf)
    assert list(out) == ["value", "user_id", "region", "note", "opt"]
    assert out["value"] == -3.0 and isinstance(out["value"], float)
    assert out["user_id"] == 7
    assert out["region"] == "unknown"
    assert out["note"] == "héllo".encode("utf-8")
    assert out["opt"] is None
    assert "legacy" not in out


def test_schema_resolution_rejects_narrowing():
    bad_reader = """
    {"type": "record", "name": "P", "fields": [
      {"name": "value", "type": "int"},
      {"name": "user_id", "type": "int"},
      {"name": "note", "type": "string"},
      {"name": "legacy", "type": "string"}
    ]}
    """
    import pytest

    # user_id: writer long -> reader int is a narrowing, not a promotion
    with pytest.raises(ValueError, match="cannot resolve"):
        C.ResolvedSchema(WRITER_V1, bad_reader)

    missing_no_default = """
    {"type": "record", "name": "P", "fields": [
      {"name": "user_id", "type": "long"},
      {"name": "brand_new", "type": "string"}
    ]}
    """
    with pytest.raises(ValueError, match="no default"):
        C.ResolvedSchema(WRITER_V1, missing_no_default)


def test_schema_resolution_spark_column(spark):
    """End-to-end through the Arrow-batched UDF: writer-encoded rows
    decoded under the reader schema inside a Spark plan."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a", 10, "x"), (2, "b", 20, "y")],
        "user_id long, note string, value int, legacy string",
    )
    wire = df.select(
        C.avro_encode_column(
            F.struct("user_id", "note", "value", "legacy"), WRITER_V1
        ).alias("payload")
    )
    out = wire.select(
        C.avro_decode_column_evolved("payload", WRITER_V1, READER_V2).alias("r")
    ).select("r.*")
    rows = {r.user_id: r for r in out.collect()}
    assert rows[1].value == 10.0 and rows[1].region == "unknown"
    assert rows[2].note == b"b" and rows[2].opt is None
    assert out.schema.simpleString() == (
        "struct<value:double,user_id:bigint,region:string,note:binary,opt:bigint>"
    )
