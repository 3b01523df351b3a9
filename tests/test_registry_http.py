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

AVRO_ADDR = json.dumps(
    {
        "type": "record",
        "name": "Address",
        "fields": [{"name": "city", "type": "string"}],
    }
)
AVRO_CUST = json.dumps(
    {
        "type": "record",
        "name": "Cust",
        "fields": [{"name": "name", "type": "string"}, {"name": "addr", "type": "Address"}],
    }
)
PROTO_BASE = 'syntax = "proto3"; package base; message Tag { string label = 1; }'
PROTO_OTHER = (
    'syntax = "proto3"; package other; import "base.proto"; '
    "message Inner { string name = 1; base.Tag tag = 2; }"
)
PROTO_EVT = (
    'syntax = "proto3"; import "other.proto"; '
    "message Evt { int32 n = 1; other.Inner inner = 2; }"
)

SCHEMAS = {
    7: {"schema": '{"type":"string"}', "schemaType": "AVRO"},
}
VERSIONS = {
    "t1-value": {
        2: {"id": 5, "version": 2, "schema": '{"type":"int"}', "schemaType": "AVRO"},
        3: {"id": 7, "version": 3, "schema": '{"type":"string"}', "schemaType": "AVRO"},
    },
    "addr": {1: {"id": 11, "version": 1, "schema": AVRO_ADDR, "schemaType": "AVRO"}},
    "cust-ref-value": {
        1: {
            "id": 12,
            "version": 1,
            "schema": AVRO_CUST,
            "schemaType": "AVRO",
            "references": [{"name": "Address", "subject": "addr", "version": 1}],
        }
    },
    "base.proto": {
        1: {"id": 20, "version": 1, "schema": PROTO_BASE, "schemaType": "PROTOBUF"}
    },
    "other.proto": {
        1: {
            "id": 21,
            "version": 1,
            "schema": PROTO_OTHER,
            "schemaType": "PROTOBUF",
            "references": [{"name": "base.proto", "subject": "base.proto", "version": 1}],
        }
    },
    "evt-ref-value": {
        1: {
            "id": 22,
            "version": 1,
            "schema": PROTO_EVT,
            "schemaType": "PROTOBUF",
            "references": [
                {"name": "other.proto", "subject": "other.proto", "version": 1}
            ],
        }
    },
}
LATEST = {
    "t1-value": VERSIONS["t1-value"][3],
    "cust-ref-value": VERSIONS["cust-ref-value"][1],
    "evt-ref-value": VERSIONS["evt-ref-value"][1],
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
    assert reg.snapshot() == {7: ("AVRO", '{"type":"string"}', ())}
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
    assert snap[5] == ("AVRO", '{"type":"int"}', ())


def test_register(sr_url):
    reg = HttpSchemaRegistry(sr_url)
    assert reg.register("t1-value", '{"type":"string"}', "AVRO") == 99


def test_avro_schema_reference_resolves(sr_url):
    """An Avro schema whose record references a named type registered under
    another subject parses once the reference prelude is applied — the
    Confluent schema-references path (KwackEngine.java:194-203)."""
    from kwack_spark.schema import avro as avro_schema
    from kwack_spark.schema.registry import resolve_references

    reg = HttpSchemaRegistry(sr_url)
    rs = reg.latest("cust-ref-value")
    assert rs.references == (("Address", "addr", 1),)
    prelude = resolve_references(reg, rs)
    assert prelude == (("Address", AVRO_ADDR),)
    st = avro_schema.to_struct_type(rs.schema_str, tuple(s for _, s in prelude))
    assert st.fieldNames() == ["name", "addr"]
    assert st["addr"].dataType.fieldNames() == ["city"]
    # without the prelude the named reference is unresolvable
    with pytest.raises(Exception, match="Address"):
        avro_schema.to_struct_type(rs.schema_str)


def test_proto_schema_reference_imports_transitively(sr_url):
    """Two-hop proto imports (evt -> other.proto -> base.proto) resolve via
    the registry's references; dependency-first order feeds the parser's
    imports table."""
    from kwack_spark.schema import protobuf as proto_schema
    from kwack_spark.schema.registry import resolve_references

    reg = HttpSchemaRegistry(sr_url)
    rs = reg.latest("evt-ref-value")
    prelude = resolve_references(reg, rs)
    assert [n for n, _ in prelude] == ["base.proto", "other.proto"]
    st = proto_schema.to_struct_type(rs.schema_str, imports=dict(prelude))
    assert st.fieldNames() == ["n", "inner"]
    inner = st["inner"].dataType
    assert inner.fieldNames() == ["name", "tag"]
    assert inner["tag"].dataType.fieldNames() == ["label"]


def test_mock_registry_references_end_to_end(spark):
    """latest-serde decode through decode_topic with a referenced Avro type:
    resolve_serde applies the reference prelude from the registry."""
    from kwack_spark.schema import avro as avro_schema
    from kwack_spark.sources import kafka as ks

    reg = MockSchemaRegistry()
    reg.register("addr", AVRO_ADDR, "AVRO")
    sid = reg.register(
        "cust-ref-value", AVRO_CUST, "AVRO", references=(("Address", "addr", 1),)
    )
    payload = avro_schema.encode(
        {"name": "alice", "addr": {"city": "springfield"}},
        avro_schema.parse_schema(AVRO_CUST, (AVRO_ADDR,)),
    )
    frame = ks.confluent_frame(payload, sid)
    import datetime

    rows = [
        (None, frame, "cust-ref", 0, 0, datetime.datetime(2024, 1, 1), 0, None)
    ]
    df = spark.createDataFrame(rows, ks.KAFKA_FRAME_SCHEMA)
    from kwack_spark.config import Serde

    out = ks.decode_topic(
        df, "cust-ref", Serde(kind="latest"), registry=reg,
        row_attributes=("off",),
    ).collect()
    assert len(out) == 1
    assert out[0].name == "alice" and out[0].addr.city == "springfield"


def test_open_registry_dispatch(sr_url):
    assert isinstance(open_registry(None), MockSchemaRegistry)
    assert isinstance(open_registry("mock://kwack"), MockSchemaRegistry)
    assert isinstance(open_registry(sr_url), HttpSchemaRegistry)


class _AuthHandler(_Handler):
    """Same endpoints, but every request must carry the expected basic-auth
    header (Confluent `basic.auth.user.info` semantics)."""

    EXPECT = "user:secret"

    def _authorized(self) -> bool:
        import base64

        want = "Basic " + base64.b64encode(self.EXPECT.encode()).decode()
        return self.headers.get("Authorization") == want

    def do_GET(self):
        if not self._authorized():
            return self._send({"error_code": 401, "message": "Unauthorized"}, 401)
        return super().do_GET()

    def do_POST(self):
        if not self._authorized():
            return self._send({"error_code": 401, "message": "Unauthorized"}, 401)
        return super().do_POST()


@pytest.fixture(scope="module")
def sr_auth_url():
    server = HTTPServer(("127.0.0.1", 0), _AuthHandler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def test_auth_required_without_credentials_fails(sr_auth_url):
    import urllib.error

    reg = HttpSchemaRegistry(sr_auth_url)
    with pytest.raises(urllib.error.HTTPError):
        reg.by_id(7)


def test_basic_auth_user_info_prop(sr_auth_url):
    reg = open_registry(sr_auth_url, {"basic.auth.user.info": "user:secret"})
    assert reg.by_id(7).schema_str == '{"type":"string"}'
    assert reg.register("t-new", '{"type":"long"}') == 99


def test_basic_auth_prefixed_prop_and_credentials_source_url(sr_auth_url):
    # schema.registry.-prefixed spelling routes identically
    reg = open_registry(
        sr_auth_url, {"schema.registry.basic.auth.user.info": "user:secret"}
    )
    assert reg.latest("t1-value").id == 7
    # credentials.source=URL: creds come from the URL userinfo (and are
    # stripped from the base URL before any request goes out)
    host = sr_auth_url[len("http://"):]
    reg = open_registry(
        f"http://user:secret@{host}",
        {"basic.auth.credentials.source": "URL"},
    )
    assert "secret" not in reg.base_url
    assert reg.by_id(7).schema_type == "AVRO"


def test_url_userinfo_used_by_default(sr_auth_url):
    host = sr_auth_url[len("http://"):]
    reg = open_registry(f"http://user:secret@{host}", {})
    assert reg.by_id(7).id == 7


def test_wrong_credentials_rejected(sr_auth_url):
    import urllib.error

    reg = open_registry(sr_auth_url, {"basic.auth.user.info": "user:wrong"})
    with pytest.raises(urllib.error.HTTPError):
        reg.latest("t1-value")


def test_ssl_context_construction(tmp_path):
    """TLS property routing -> SSLContext shape (PEM surface; the
    reference's keystore/truststore block KwackConfig.java:100-150).  No
    TLS server here — the context's own flags are the contract."""
    import ssl

    from kwack_spark.schema.registry import _build_ssl_context

    assert _build_ssl_context({}) is None
    ctx = _build_ssl_context(
        {"enable.ssl.certificate.verification": "false"}
    )
    assert ctx.verify_mode == ssl.CERT_NONE and not ctx.check_hostname
    # CA bundle: generate nothing — point at a missing file and expect the
    # loader to surface the error (proves the path is actually used)
    with pytest.raises(OSError):
        _build_ssl_context({"ssl.ca.location": str(tmp_path / "nope.pem")})
    # default remains a verified context
    ctx = _build_ssl_context(
        {"schema.registry.enable.ssl.certificate.verification": "true"}
    )
    assert ctx.verify_mode == ssl.CERT_REQUIRED and ctx.check_hostname


def test_url_userinfo_percent_encoding_and_ipv6(sr_auth_url):
    """Percent-encoded userinfo must be decoded before the Basic header is
    built, and stripping userinfo must not mangle the rest of the netloc
    (urlsplit drops IPv6 brackets, so the rebuild must reuse netloc)."""
    host = sr_auth_url[len("http://"):]
    # password 'secret' spelled with a percent-encoded char ('%74' = 't')
    reg = open_registry(f"http://user:secre%74@{host}", {})
    assert reg.by_id(7).id == 7
    # IPv6 literal: base_url must keep the brackets
    reg6 = open_registry("https://u:p@[::1]:8081/ctx", {})
    assert reg6.base_url == "https://[::1]:8081/ctx"


def test_credentials_source_url_without_userinfo_raises(sr_auth_url):
    with pytest.raises(ValueError, match="carries no userinfo"):
        open_registry(sr_auth_url, {"basic.auth.credentials.source": "URL"})
