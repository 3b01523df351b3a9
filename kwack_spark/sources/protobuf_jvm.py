"""JVM whole-stage Protobuf decode fast path (plumbed-and-gated).

Completes the JVM-decode story for all three registry formats
(sources/avro_jvm.py, sources/jsonschema_jvm.py): the reference decodes
Protobuf per record in Java (KwackEngine.java:516-585 via Confluent's
deserializer), while this repo's general path is the Python wire codec
(schema/protobuf.py) — correct for every schema shape but ~10x the per-record
cost.  Spark's ``from_protobuf`` (the spark-protobuf external module) keeps
scan+decode inside the JVM; this module gates it on facts that make the two
paths RESULT-IDENTICAL, and silently falls back to the Python stage
otherwise — decode_topic never changes behavior, only its physical plan.

SANDBOX NOTE: like spark-avro, the spark-protobuf jar is absent in this
environment, so ``available()`` is always False here and the gate can never
activate; real deployments that add the module get JVM-cost proto decode
with zero code changes.  The descriptor plumbing below is still fully
exercised by tests: the binary ``FileDescriptorSet`` this module builds is
round-tripped through this repo's OWN wire decoder against a descriptor.proto
schema, so the bytes handed to ``from_protobuf`` are known well-formed.

Gates (each with the reason it exists):

1. availability — probed once per session by ANALYZING a trivial
   ``from_protobuf`` plan (the module raises
   PROTOBUF_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE at analysis when absent).
2. single top-level message — Confluent frames carry a varint
   message-index path after the 5-byte header (schema/protobuf.py:382-433);
   with exactly one top-level message every conforming record's path is
   [0], encoded as the single byte 0x00, so the JVM path can strip a FIXED
   1-byte prefix (guarded: any other first byte raises, honoring fail
   mode).  Multi-message files need per-record index dispatch = Python.
3. schema compatibility — the declared shape must map to the SAME Spark
   type under this repo's matrix (schema/protobuf.py:SCALARS /
   descriptor_struct_type) and spark-protobuf's converters.  Divergences
   enumerated in _compat_reason: unsigned ints (uint32/fixed32 -> Long
   here vs Integer there, uint64/fixed64 -> Decimal(20,0) here vs Long
   there — spark-protobuf's unsigned-upcast option is not assumed since it
   cannot be probed in-sandbox), oneofs (union struct here vs flattened
   members there), maps / well-known types / wrappers (descriptor
   dependencies + different null semantics), proto3 ``optional`` and
   proto2 ``required`` labels (presence-tracking differs), imported types
   (need dependency descriptors), and recursive messages.
4. no evolution — every schema registered under the topic's value subject
   parses identical to the reader, so per-record writer resolution is a
   no-op (mirrors avro_jvm's gate; proto wire data is reader-decoded on
   both paths, but message-index positions are writer-file-positional).
"""

from __future__ import annotations

import io
import weakref
from typing import Any

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from kwack_spark.schema import protobuf as proto_schema
from kwack_spark.schema.protobuf import SCALARS, _write_varint

_AVAILABLE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()

# FieldDescriptorProto.Type numbers (public descriptor.proto)
_TYPE_NUM = {
    "double": 1,
    "float": 2,
    "int64": 3,
    "uint64": 4,
    "int32": 5,
    "fixed64": 6,
    "fixed32": 7,
    "bool": 8,
    "string": 9,
    "bytes": 12,
    "uint32": 13,
    "sfixed32": 15,
    "sfixed64": 16,
    "sint32": 17,
    "sint64": 18,
}
_TYPE_MESSAGE, _TYPE_ENUM = 11, 14
_LABEL_OPTIONAL, _LABEL_REPEATED = 1, 3

# scalar widths whose Spark mapping differs between this repo
# (schema/protobuf.py:SCALARS) and spark-protobuf's default converters
_UNSIGNED = {"uint32", "fixed32", "uint64", "fixed64"}


# ---------------------------------------------------------------------------
# FileDescriptorSet builder (wire-encoded with this repo's own primitives)
# ---------------------------------------------------------------------------


def _ld(out: io.BytesIO, fnum: int, payload: bytes) -> None:
    _write_varint(out, fnum << 3 | 2)
    _write_varint(out, len(payload))
    out.write(payload)


def _vi(out: io.BytesIO, fnum: int, v: int) -> None:
    _write_varint(out, fnum << 3 | 0)
    _write_varint(out, v)


def _resolve_local(tname: str, scopes: list[tuple[str, dict]], root: dict):
    """Find a field's message/enum type among the enclosing local scopes
    (innermost first) then the file's top level.  Returns
    (kind, dotted-path-parts) or None for imported/unknown types."""
    chain = [(None, root)] + scopes
    for depth in range(len(chain) - 1, -1, -1):
        scope = chain[depth][1]
        path = [n for n, _ in chain[1 : depth + 1]]
        if tname in scope.get("messages", {}):
            return "message", path + [tname]
        if tname in scope.get("enums", {}):
            return "enum", path + [tname]
    return None


def _enum_proto(name: str, node: dict) -> bytes:
    out = io.BytesIO()
    _ld(out, 1, name.encode())
    for num in sorted(node["symbols"]):
        val = io.BytesIO()
        _ld(val, 1, node["symbols"][num].encode())
        _vi(val, 2, num)
        _ld(out, 2, val.getvalue())
    return out.getvalue()


def _field_proto(f: dict, scopes: list, root: dict, pkg: str) -> bytes:
    out = io.BytesIO()
    _ld(out, 1, f["name"].encode())
    _vi(out, 3, f["number"])
    _vi(out, 4, _LABEL_REPEATED if f.get("label") == "repeated" else _LABEL_OPTIONAL)
    t = f["type"]
    if t in _TYPE_NUM:
        _vi(out, 5, _TYPE_NUM[t])
    else:
        hit = _resolve_local(t, scopes, root)
        if hit is None:
            raise proto_schema.ProtoSchemaError(
                f"type {t!r} not declared in this file (gate should have "
                "rejected imported/WKT types)"
            )
        kind, parts = hit
        _vi(out, 5, _TYPE_MESSAGE if kind == "message" else _TYPE_ENUM)
        fq = "." + ".".join(([pkg] if pkg else []) + parts)
        _ld(out, 6, fq.encode())
    return out.getvalue()


def _message_proto(
    name: str, msg: dict, scopes: list, root: dict, pkg: str
) -> bytes:
    out = io.BytesIO()
    _ld(out, 1, name.encode())
    inner = scopes + [(name, msg)]
    for f in msg["fields"]:
        _ld(out, 2, _field_proto(f, inner, root, pkg))
    for nname, nmsg in msg.get("messages", {}).items():
        _ld(out, 3, _message_proto(nname, nmsg, inner, root, pkg))
    for ename, enode in msg.get("enums", {}).items():
        _ld(out, 4, _enum_proto(ename, enode))
    return out.getvalue()


def build_descriptor_set(root: dict, file_name: str = "kwack_topic.proto") -> bytes:
    """Parsed .proto (schema/protobuf.py:parse_proto) -> serialized
    ``FileDescriptorSet`` bytes, the form ``from_protobuf``'s
    ``binaryDescriptorSet`` parameter takes.  Local types only — the gate
    rejects schemas whose fields need dependency descriptors."""
    pkg = root.get("package", "")
    fdp = io.BytesIO()
    _ld(fdp, 1, file_name.encode())
    if pkg:
        _ld(fdp, 2, pkg.encode())
    for name, msg in root["messages"].items():
        _ld(fdp, 4, _message_proto(name, msg, [], root, pkg))
    for name, enode in root["enums"].items():
        _ld(fdp, 5, _enum_proto(name, enode))
    _ld(fdp, 12, b"proto3")  # syntax
    fds = io.BytesIO()
    _ld(fds, 1, fdp.getvalue())
    return fds.getvalue()


def default_message_name(root: dict) -> str:
    """Fully qualified name of the file's first (= index-[0]) message."""
    first = next(iter(root["messages"]))
    pkg = root.get("package", "")
    return f"{pkg}.{first}" if pkg else first


# ---------------------------------------------------------------------------
# gates
# ---------------------------------------------------------------------------

_PROBE_PROTO = "syntax = \"proto3\"; message KwackProbe { int64 a = 1; }"


def available(spark: SparkSession) -> bool:
    """Can ``from_protobuf`` analyze in this session?  Probes ONCE by
    analyzing (not running) a trivial plan; the spark-protobuf module
    raises PROTOBUF_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE at analysis when the
    jar is absent (always the case in this sandbox)."""
    if spark not in _AVAILABLE:
        try:
            from pyspark.sql.protobuf.functions import from_protobuf

            ds = build_descriptor_set(proto_schema.parse_proto(_PROBE_PROTO))
            df = spark.range(1).select(F.lit(b"\x00").alias("v"))
            df.select(
                from_protobuf("v", "KwackProbe", binaryDescriptorSet=ds)
            ).schema  # analysis only
            _AVAILABLE[spark] = True
        except Exception:
            _AVAILABLE[spark] = False
    return _AVAILABLE[spark]


def _compat_reason(
    msg: dict, scopes: list, root: dict, visiting: tuple = ()
) -> str | None:
    """None if spark-protobuf's default converters produce the SAME Spark
    schema/values as schema/protobuf.py for this message; else the reason
    the Python path keeps the query."""
    if msg.get("oneofs"):
        return "oneof (union-struct tagging here vs flattened members there)"
    for f in msg["fields"]:
        if f.get("label") in ("optional", "required"):
            return f"{f['label']!r} label (presence tracking differs)"
        t = f["type"]
        if isinstance(t, tuple):  # ('map', k, v)
            return "map field (descriptor map-entry synthesis + null semantics)"
        if t in _UNSIGNED:
            return (
                f"unsigned scalar {t!r} (Long/Decimal here vs wrapped "
                "Integer/Long in spark-protobuf's default converters)"
            )
        if t in SCALARS:
            continue
        if t in proto_schema.WRAPPERS or t.startswith(
            ("google.protobuf.", "google.type.", "confluent.type.")
        ):
            return f"well-known/wrapper type {t!r} needs dependency descriptors"
        hit = _resolve_local(t, scopes, root)
        if hit is None:
            return f"type {t!r} imported or undeclared (needs dependency descriptors)"
        kind, parts = hit
        if kind == "message":
            key = ".".join(parts)
            if key in visiting:
                return f"recursive message {key!r}"
            node = root
            for p in parts:
                node = node["messages"][p]
            r = _compat_reason(
                node, scopes + [(parts[-1], node)], root, visiting + (key,)
            )
            if r:
                return r
    return None


def eligible(value_serde, topic: str, registry) -> tuple[bool, str]:
    """Pure gate (no Spark needed): (ok, reason).  ``value_serde`` must be
    the post-resolve_serde concrete serde (kind 'proto' — the canonical
    kind resolve_serde produces for PROTOBUF; r05 ADVICE found the previous
    'protobuf' literal made this gate unreachable for real serdes)."""
    if value_serde.kind != "proto":
        return False, f"serde kind {value_serde.kind!r}"
    if value_serde.tag is not None:
        return False, "key-field injection (;tag:) needs the Python path"
    if value_serde.refs:
        return False, "schema references need dependency descriptors"
    try:
        root = proto_schema.parse_proto(value_serde.schema_str)
    except Exception as exc:
        return False, f"unparseable schema: {exc}"
    if not root["messages"]:
        return False, "no message declared"
    if len(root["messages"]) != 1:
        return False, (
            "multiple top-level messages: per-record message-index dispatch "
            "needs the Python path"
        )
    name, msg = next(iter(root["messages"].items()))
    r = _compat_reason(msg, [(name, msg)], root)
    if r:
        return False, r
    if registry is not None:
        subject = f"{topic}-value"
        try:
            versions = registry.subject_versions(subject)
        except KeyError:
            versions = []  # no registered subject -> inline schema governs
        except Exception as exc:
            return False, f"registry check failed: {exc!r}"
        for rs in versions:
            if rs.schema_type != "PROTOBUF":
                return False, f"{subject} v{rs.version} is {rs.schema_type}"
            try:
                same = proto_schema.parse_proto(rs.schema_str) == root
            except Exception as exc:
                return False, (
                    f"{subject} v{rs.version} unparseable standalone "
                    f"(references?): {exc}"
                )
            if not same:
                return False, (
                    f"writer evolution: {subject} v{rs.version} differs from "
                    "the reader (message-index positions are file-positional)"
                )
    return True, "ok"


def decode_value_col(payload: Column, schema_str: str, on_error: str) -> Column:
    """``from_protobuf`` over an already-unframed (post magic+schema-id)
    payload column.  Fail mode only, matching the other JVM paths; the
    1-byte [0] message-index prefix is stripped JVM-side with a guard that
    RAISES on any other index byte (a non-[0] path on a gate-eligible
    single-message file is a nonconforming frame — fail mode's contract)."""
    if on_error != "fail":
        raise ValueError(
            "JVM from_protobuf fast path supports on_error='fail' only; "
            "'skip' requires the Python decode stage"
        )
    from pyspark.sql.protobuf.functions import from_protobuf

    root = proto_schema.parse_proto(schema_str)
    ds = build_descriptor_set(root)
    body = F.when(
        F.substring(payload, 1, 1) == F.lit(b"\x00"),
        payload.substr(F.lit(2), F.length(payload)),
    ).otherwise(
        F.raise_error(
            F.lit(
                "non-[0] Confluent message-index prefix on a single-message "
                "topic (corrupt or nonconforming frame)"
            )
        ).cast("binary")
    )
    return from_protobuf(
        body,
        default_message_name(root),
        binaryDescriptorSet=ds,
        options={"mode": "FAILFAST"},
    )
