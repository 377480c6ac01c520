"""Schema Registry thin-client tests — mocked transport + loopback HTTP.

The container has no registry, so the client is driven two ways:
(1) an injected in-memory transport that records traffic (cache
behavior, protocol shapes), and (2) a real stdlib HTTP server on
127.0.0.1 proving the default urllib transport speaks the wire
protocol. Reference surface: CachedSchemaRegistryClient + auto-register
(dsl/PriceAlertsApp.java:33,36-37)."""

from __future__ import annotations

import json
import threading

import pytest

from kafka_streams_homework_spark.sources.schema_registry import (
    SchemaRegistryClient,
    resolve_frame_schemas,
    urllib_transport,
)

PURCHASE_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Purchase",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "quantity", "type": "long"},
            {"name": "productid", "type": "long"},
        ],
    }
)


class FakeRegistry:
    """In-memory registry + transport. Mirrors the REST protocol the
    client speaks; counts calls so cache tests can assert traffic."""

    def __init__(self):
        self.schemas: dict[int, str] = {}
        self.subjects: dict[str, list[int]] = {}
        self.calls: list[tuple[str, str]] = []
        self._next = 1

    def transport(self, method: str, url: str, body: bytes | None) -> str:
        self.calls.append((method, url))
        path = url.split("://", 1)[-1].split("/", 1)[1]
        parts = path.split("/")
        if method == "POST" and parts[0] == "subjects" and parts[2] == "versions":
            schema = json.loads(body)["schema"]
            for sid, s in self.schemas.items():
                if s == schema:
                    self.subjects.setdefault(parts[1], []).append(sid)
                    return json.dumps({"id": sid})
            sid = self._next
            self._next += 1
            self.schemas[sid] = schema
            self.subjects.setdefault(parts[1], []).append(sid)
            return json.dumps({"id": sid})
        if method == "GET" and parts[0] == "schemas" and parts[1] == "ids":
            return json.dumps({"schema": self.schemas[int(parts[2])]})
        if (
            method == "GET"
            and parts[0] == "subjects"
            and parts[2] == "versions"
            and parts[3] == "latest"
        ):
            sid = self.subjects[parts[1]][-1]
            return json.dumps(
                {
                    "id": sid,
                    "version": len(self.subjects[parts[1]]),
                    "schema": self.schemas[sid],
                }
            )
        raise AssertionError(f"unexpected request {method} {url}")


def test_register_and_fetch_roundtrip():
    reg = FakeRegistry()
    c = SchemaRegistryClient("http://registry:8081", transport=reg.transport)
    sid = c.register("purchase-value", PURCHASE_SCHEMA)
    assert sid == 1
    assert json.loads(c.get_schema(sid)) == json.loads(PURCHASE_SCHEMA)
    lid, lschema = c.latest("purchase-value")
    assert lid == sid and lschema == PURCHASE_SCHEMA


def test_cache_suppresses_repeat_traffic():
    reg = FakeRegistry()
    c = SchemaRegistryClient("http://registry:8081", transport=reg.transport)
    sid = c.register("purchase-value", PURCHASE_SCHEMA)
    n_after_register = len(reg.calls)
    # repeat register with semantically identical (re-serialized) schema
    assert c.register("purchase-value", PURCHASE_SCHEMA) == sid
    reordered = json.dumps(json.loads(PURCHASE_SCHEMA))
    assert c.register("purchase-value", reordered) == sid
    # repeat fetches: register already primed the id->schema cache
    for _ in range(5):
        c.get_schema(sid)
    assert len(reg.calls) == n_after_register  # zero extra round-trips


def test_get_schema_caches_by_id():
    reg = FakeRegistry()
    reg.schemas[42] = PURCHASE_SCHEMA
    c = SchemaRegistryClient("http://registry:8081", transport=reg.transport)
    for _ in range(3):
        assert c.get_schema(42) == PURCHASE_SCHEMA
    assert len(reg.calls) == 1


def test_default_transport_speaks_http_loopback():
    import http.server

    reg = FakeRegistry()

    class Handler(http.server.BaseHTTPRequestHandler):
        def _serve(self, method):
            n = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n) if n else None
            out = reg.transport(
                method, f"http://x/{self.path.lstrip('/')}", body
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def do_GET(self):
            self._serve("GET")

        def do_POST(self):
            self._serve("POST")

        def log_message(self, *a):  # quiet
            pass

    try:
        srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    except OSError:
        pytest.skip("cannot bind loopback in this sandbox")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}"
        c = SchemaRegistryClient(url, transport=urllib_transport(timeout=5))
        sid = c.register("purchase-value", PURCHASE_SCHEMA)
        assert c.get_schema(sid) == PURCHASE_SCHEMA
        assert c.latest("purchase-value") == (sid, PURCHASE_SCHEMA)
    finally:
        srv.shutdown()


def test_unreachable_registry_gates_with_clear_error():
    c = SchemaRegistryClient(
        "http://127.0.0.1:9", transport=urllib_transport(timeout=0.2)
    )
    with pytest.raises(RuntimeError, match="schema registry unreachable"):
        c.get_schema(1)


def test_resolve_frame_schemas_bounded_distinct(spark):
    """The frame->schema map collects only DISTINCT wire ids (bounded
    by registry size, not row count) and resolves each through the
    cache exactly once."""
    reg = FakeRegistry()
    reg.schemas[7] = PURCHASE_SCHEMA
    reg.schemas[9] = PURCHASE_SCHEMA.replace("Purchase", "PurchaseV2")
    c = SchemaRegistryClient("http://registry:8081", transport=reg.transport)
    rows = []
    for sid in (7, 9):
        frame = bytes([0]) + sid.to_bytes(4, "big") + b"payload"
        rows.extend([(frame,)] * 50)  # 100 rows, 2 distinct ids
    df = spark.createDataFrame(rows, "value binary")
    m = resolve_frame_schemas(df, c)
    assert set(m) == {7, 9}
    assert m[7] == PURCHASE_SCHEMA
    assert len([x for x in reg.calls if "schemas/ids" in x[1]]) == 2
