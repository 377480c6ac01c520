"""Thin Confluent Schema Registry client — the reference's registry edge.

Reference: ``new CachedSchemaRegistryClient(SCHEMA_REGISTRY_URL, 100)``
(dsl/PriceAlertsApp.java:33) and serdes configured with
``auto.register.schemas=true`` (dsl:36-37). The engine's Avro path
(sources/avro_codec.py + the in-plan Confluent framing in
sources/kafka.py) already speaks the byte format with static schema
ids; this module closes the remaining surface gap — fetching/registering
schemas over the registry's REST protocol — the day the environment
provisions a registry. No broker or registry exists in this container,
so the default HTTP transport is gated behind the same clear-error
discipline as the Kafka transport, and tests drive the client through
an injected transport plus a real loopback HTTP server.

Protocol (public Confluent REST spec, v1 content type):
  POST /subjects/{subject}/versions   {"schema": "..."} -> {"id": N}
  GET  /schemas/ids/{id}              -> {"schema": "..."}
  GET  /subjects/{subject}/versions/latest
                                      -> {"id": N, "version": V,
                                          "schema": "..."}

Caching mirrors CachedSchemaRegistryClient: both directions
(id -> schema, (subject, normalized schema) -> id) are memoized so a
1000-executor job hitting one driver-side client never amplifies
registry traffic with record volume — schema resolution happens ONCE
per distinct id at plan-construction time, never per row.
"""

from __future__ import annotations

import json
from typing import Callable

REGISTRY_CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"

# transport: (method, url, body_bytes_or_None) -> response_json_str
Transport = Callable[[str, str, bytes | None], str]


def _normalize(schema_json: str) -> str:
    """Canonical form for cache keys: whitespace-insensitive, key-order
    stable. (Not full Avro canonical form — good enough for caching;
    the registry itself is the authority on schema identity.)"""
    return json.dumps(json.loads(schema_json), sort_keys=True, separators=(",", ":"))


def urllib_transport(timeout: float = 10.0) -> Transport:
    """Default transport over stdlib urllib. Constructed lazily so
    importing this module never requires network access."""

    def send(method: str, url: str, body: bytes | None) -> str:
        import urllib.request

        req = urllib.request.Request(
            url,
            data=body,
            method=method,
            headers={"Content-Type": REGISTRY_CONTENT_TYPE},
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.read().decode("utf-8")
        except Exception as ex:  # noqa: BLE001 - re-gate with a clear error
            raise RuntimeError(
                f"schema registry unreachable at {url!r}: {ex}. No "
                "registry is provisioned in this environment; pass a "
                "transport (tests) or point SCHEMA_REGISTRY_URL at a "
                "live registry."
            ) from ex

    return send


class SchemaRegistryClient:
    """Cached registry client (reference: CachedSchemaRegistryClient).

    All methods are DRIVER-side: they resolve schema text/ids that then
    enter the Spark plan as static arguments to the Avro codec columns.
    Nothing here runs per row or per partition.
    """

    def __init__(self, base_url: str, transport: Transport | None = None):
        self.base_url = base_url.rstrip("/")
        self._send = transport or urllib_transport()
        self._by_id: dict[int, str] = {}
        self._id_by_schema: dict[tuple[str, str], int] = {}

    # -- registration (auto.register.schemas=true path, dsl:36) --
    def register(self, subject: str, schema_json: str) -> int:
        """Register a schema under a subject; returns the global id.
        Idempotent on the registry side AND memoized here."""
        key = (subject, _normalize(schema_json))
        if key in self._id_by_schema:
            return self._id_by_schema[key]
        body = json.dumps({"schema": schema_json}).encode("utf-8")
        resp = json.loads(
            self._send(
                "POST", f"{self.base_url}/subjects/{subject}/versions", body
            )
        )
        sid = int(resp["id"])
        self._id_by_schema[key] = sid
        self._by_id.setdefault(sid, schema_json)
        return sid

    # -- resolution (consumer path: wire-format id -> writer schema) --
    def get_schema(self, schema_id: int) -> str:
        if schema_id in self._by_id:
            return self._by_id[schema_id]
        resp = json.loads(
            self._send("GET", f"{self.base_url}/schemas/ids/{schema_id}", None)
        )
        schema = resp["schema"]
        self._by_id[schema_id] = schema
        return schema

    def latest(self, subject: str) -> tuple[int, str]:
        """(id, schema) of the subject's latest version. Not cached:
        'latest' is a moving target by definition."""
        resp = json.loads(
            self._send(
                "GET",
                f"{self.base_url}/subjects/{subject}/versions/latest",
                None,
            )
        )
        sid, schema = int(resp["id"]), resp["schema"]
        self._by_id[sid] = schema
        return sid, schema


def resolve_frame_schemas(df, client: SchemaRegistryClient) -> dict[int, str]:
    """Map every DISTINCT Confluent schema id present in a wire-format
    frame to its writer schema text.

    The distinct-id set is bounded by the registry's schema count (tens
    to thousands), never by record volume, so the collect here is a
    bounded driver-side plan-construction step — the same shape as
    collecting IVF centroids. The returned map feeds
    ``avro_decode_column_evolved(value, writer, reader)`` once per id
    (filter by id, decode with that writer schema, union), which is how
    a mixed-schema-version topic is consumed after an evolution.
    """
    from kafka_streams_homework_spark.sources.kafka import confluent_schema_id

    ids = [
        r[0]
        for r in df.select(confluent_schema_id(df["value"]).alias("sid"))
        .distinct()
        .collect()
    ]
    return {int(i): client.get_schema(int(i)) for i in ids}
