"""HttpSchemaRegistry against a local mock Confluent REST endpoint —
exercises the real wire protocol (paths, content types, JSON shapes) without
a Schema Registry deployment."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from kwack_spark.schema.registry import (
    HttpSchemaRegistry,
    MockSchemaRegistry,
    open_registry,
)

SCHEMAS = {
    7: {"schema": '{"type":"string"}', "schemaType": "AVRO"},
}
VERSIONS = {
    "t1-value": {
        2: {"id": 5, "version": 2, "schema": '{"type":"int"}', "schemaType": "AVRO"},
        3: {"id": 7, "version": 3, "schema": '{"type":"string"}', "schemaType": "AVRO"},
    },
}
LATEST = {
    "t1-value": VERSIONS["t1-value"][3],
}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _send(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path.startswith("/schemas/ids/"):
            sid = int(self.path.rsplit("/", 1)[-1])
            if sid in SCHEMAS:
                return self._send(SCHEMAS[sid])
            return self._send({"error_code": 40403}, 404)
        if self.path.startswith("/subjects/") and self.path.endswith("/versions/latest"):
            subject = self.path.split("/")[2]
            if subject in LATEST:
                return self._send(LATEST[subject])
            return self._send({"error_code": 40401}, 404)
        if self.path.startswith("/subjects/") and "/versions/" in self.path:
            parts = self.path.split("/")
            subject, version = parts[2], int(parts[4])
            if subject in VERSIONS and version in VERSIONS[subject]:
                return self._send(VERSIONS[subject][version])
            return self._send({"error_code": 40402}, 404)
        if self.path.startswith("/subjects/") and self.path.endswith("/versions"):
            subject = self.path.split("/")[2]
            if subject in VERSIONS:
                return self._send(sorted(VERSIONS[subject]))
            return self._send({"error_code": 40401}, 404)
        return self._send({}, 404)

    def do_POST(self):
        if self.path.startswith("/subjects/") and self.path.endswith("/versions"):
            length = int(self.headers["Content-Length"])
            payload = json.loads(self.rfile.read(length))
            assert "schema" in payload
            return self._send({"id": 99})
        return self._send({}, 404)


@pytest.fixture(scope="module")
def sr_url():
    server = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def test_by_id_and_cache(sr_url):
    reg = HttpSchemaRegistry(sr_url)
    rs = reg.by_id(7)
    assert rs.schema_str == '{"type":"string"}' and rs.schema_type == "AVRO"
    assert reg.snapshot() == {7: ("AVRO", '{"type":"string"}')}
    # cached: served again without the server (cache hit)
    assert reg.by_id(7).id == 7


def test_latest_preloads_all_versions(sr_url):
    """Older writer ids must be in the snapshot (evolution: executors only
    see the broadcast snapshot)."""
    reg = HttpSchemaRegistry(sr_url)
    rs = reg.latest("t1-value")
    assert rs.id == 7 and rs.version == 3
    snap = reg.snapshot()
    assert 7 in snap and 5 in snap  # latest AND the older version's id
    assert snap[5] == ("AVRO", '{"type":"int"}')


def test_register(sr_url):
    reg = HttpSchemaRegistry(sr_url)
    assert reg.register("t1-value", '{"type":"string"}', "AVRO") == 99


def test_open_registry_dispatch(sr_url):
    assert isinstance(open_registry(None), MockSchemaRegistry)
    assert isinstance(open_registry("mock://kwack"), MockSchemaRegistry)
    assert isinstance(open_registry(sr_url), HttpSchemaRegistry)
