"""Protobuf schema (.proto text) -> Spark StructType + wire-format codec.

Capability parity with the reference's ProtobufTransformer
(/root/reference/src/main/java/io/kcache/kwack/transformer/protobuf/
ProtobufTransformer.java:64-381), re-expressed for Spark with no protobuf
library dependency: a small .proto text parser covers the subset the
reference exercises (messages, nested messages, enums, oneof, repeated,
map<k,v>, scalar types incl. unsigned/fixed, well-known types), and the
decoder implements the proto3 wire format (varint / 64-bit / length-
delimited / 32-bit).

Type mapping (SURVEY.md §1.3):
- int32/sint32/sfixed32 -> IntegerType; uint32/fixed32 -> LongType
  (no unsigned 32 in Spark; widen losslessly)
- int64/sint64/sfixed64 -> LongType; uint64/fixed64 -> DecimalType(20,0)
  (lossless; mirrors the reference surfacing BigInteger,
  ProtobufTest.java:98)
- enum -> StringType; oneof -> ONE union struct column named after the
  oneof, branch fields named after the member fields
  (ProtobufTransformer.java:84-106); unset oneof -> NULL
- wrapper messages google.protobuf.*Value unwrap to nullable scalars
  (ProtobufTransformer.java:207-237)
- google.protobuf.Timestamp -> TimestampType (truncate nanos to micros);
  google.protobuf.Duration -> DayTimeIntervalType; google.type.Date ->
  DateType; google.type.TimeOfDay -> LongType micros-since-midnight;
  confluent.type.Decimal -> DecimalType(p,s) from field meta
  (ProtobufTransformer.java:153-187)
"""

from __future__ import annotations

import datetime
import decimal
import io
import re
import struct
from typing import Any, Callable

from pyspark.sql import types as ST

SCALARS = {
    "double": ST.DoubleType(),
    "float": ST.FloatType(),
    "int32": ST.IntegerType(),
    "sint32": ST.IntegerType(),
    "sfixed32": ST.IntegerType(),
    "uint32": ST.LongType(),
    "fixed32": ST.LongType(),
    "int64": ST.LongType(),
    "sint64": ST.LongType(),
    "sfixed64": ST.LongType(),
    "uint64": ST.DecimalType(20, 0),
    "fixed64": ST.DecimalType(20, 0),
    "bool": ST.BooleanType(),
    "string": ST.StringType(),
    "bytes": ST.BinaryType(),
}

WRAPPERS = {
    "google.protobuf.DoubleValue": "double",
    "google.protobuf.FloatValue": "float",
    "google.protobuf.Int64Value": "int64",
    "google.protobuf.UInt64Value": "uint64",
    "google.protobuf.Int32Value": "int32",
    "google.protobuf.UInt32Value": "uint32",
    "google.protobuf.BoolValue": "bool",
    "google.protobuf.StringValue": "string",
    "google.protobuf.BytesValue": "bytes",
}

_EPOCH = datetime.datetime(1970, 1, 1)


class ProtoSchemaError(ValueError):
    pass


# ---------------------------------------------------------------------------
# .proto text parser (subset)
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""\s*(?:(//[^\n]*|/\*.*?\*/)|([A-Za-z_][\w.]*)|(<|>|\{|\}|=|;|,|\[|\]|\(|\)|:)|("(?:[^"\\]|\\.)*")|(-?\d+))""",
    re.DOTALL,
)


def _tokenize(text: str) -> list[str]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN.match(text, i)
        if not m:
            if text[i:].strip():
                raise ProtoSchemaError(f"cannot tokenize near: {text[i:i+30]!r}")
            break
        i = m.end()
        if m.group(1):
            continue  # comment
        out.append(next(g for g in m.groups()[1:] if g is not None))
    return out


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ProtoSchemaError("unexpected end of .proto")
        self.i += 1
        return t

    def expect(self, tok: str) -> None:
        t = self.next()
        if t != tok:
            raise ProtoSchemaError(f"expected {tok!r}, got {t!r}")

    def skip_statement(self) -> None:
        # consume through ';' or a balanced '{...}' block
        depth = 0
        while True:
            t = self.next()
            if t == "{":
                depth += 1
            elif t == "}":
                depth -= 1
                if depth == 0:
                    return
            elif t == ";" and depth == 0:
                return


def parse_proto(text: str, imports: dict[str, str] | None = None) -> dict:
    """Parse .proto source -> {'messages': {name: msg}, 'enums': {...},
    'package': str}.  Message: {'fields': [...], 'oneofs': {name: [fields]},
    'messages': nested, 'enums': nested}.

    ``imports``: {import path -> .proto source} for ``import "x.proto";``
    statements — the Confluent schema-references mechanism, where a
    registered proto schema's ``references`` list maps import paths to
    registry subjects (the reference's deserializer resolves them through
    its registry client, KwackEngine.java:194-203).  Imported top-level
    types merge into this file's type table under both their bare and
    package-qualified names, so fields may say ``Msg`` or ``other.Msg``;
    unknown import paths (e.g. google/protobuf/*.proto, whose well-known
    types are built in) are skipped exactly as before."""
    p = _Parser(_tokenize(text))
    root: dict = {"messages": {}, "enums": {}, "package": ""}
    while p.peek() is not None:
        t = p.next()
        if t == "import":
            if p.peek() in ("public", "weak"):  # import [public|weak] "x";
                p.next()
            path_tok = p.next()
            p.expect(";")
            path = path_tok.strip('"')
            if imports and path in imports:
                _merge_imported(root, parse_proto(imports[path], imports))
        elif t in ("syntax", "option"):
            p.skip_statement()
        elif t == "package":
            root["package"] = _join_dotted(p, p.next())
            p.expect(";")
        elif t == "message":
            name = p.next()
            root["messages"][name] = _parse_message(p)
        elif t == "enum":
            name = p.next()
            root["enums"][name] = _parse_enum(p)
        elif t == ";":
            continue
        else:
            raise ProtoSchemaError(f"unexpected top-level token: {t!r}")
    return root


def _merge_imported(root: dict, imported: dict) -> None:
    """Fold an imported file's top-level messages/enums into ``root``'s
    SEPARATE imported-type table under bare + package-qualified names
    (dotted keys — _lookup matches the dotted type name a field spells
    verbatim, after local scopes/declarations).  A separate table, NOT
    root['messages']: the Confluent message-index wire path and the
    default-message choice are positional over the file's OWN declarations
    (ProtobufSchema.toMessageIndexes), which imports must not shift."""
    for kind in ("messages", "enums"):
        tbl = root.setdefault(f"imported_{kind}", {})
        pkg = imported["package"]
        for name, node in imported[kind].items():
            tbl.setdefault(name, node)
            if pkg:
                tbl[f"{pkg}.{name}"] = node
        # types a transitive import exposed to the imported file flow up too
        for name, node in imported.get(f"imported_{kind}", {}).items():
            tbl.setdefault(name, node)


def _parse_enum(p: _Parser) -> dict:
    p.expect("{")
    symbols: dict[int, str] = {}
    while True:
        t = p.next()
        if t == "}":
            break
        if t in ("option", "reserved"):
            p.skip_statement()
            continue
        name = t
        p.expect("=")
        num = int(p.next())
        # optional [ ... ] then ';'
        while p.peek() not in (";",):
            p.next()
        p.expect(";")
        symbols[num] = name
    return {"symbols": symbols}


def _parse_field_type(p: _Parser) -> Any:
    t = p.next()
    if t == "map":
        p.expect("<")
        kt = p.next()
        p.expect(",")
        vt = _read_dotted(p)
        p.expect(">")
        return ("map", kt, vt)
    return _join_dotted(p, t)


def _read_dotted(p: _Parser) -> str:
    return _join_dotted(p, p.next())


def _join_dotted(p: _Parser, first: str) -> str:
    return first  # dotted names arrive as single tokens (regex includes '.')


def _parse_message(p: _Parser) -> dict:
    p.expect("{")
    msg: dict = {"fields": [], "oneofs": {}, "messages": {}, "enums": {}}
    while True:
        t = p.peek()
        if t is None:
            raise ProtoSchemaError("unterminated message")
        if t == "}":
            p.next()
            break
        if t in ("option", "reserved", "extensions"):
            p.next()
            p.skip_statement()
            continue
        if t == "message":
            p.next()
            name = p.next()
            msg["messages"][name] = _parse_message(p)
            continue
        if t == "enum":
            p.next()
            name = p.next()
            msg["enums"][name] = _parse_enum(p)
            continue
        if t == "oneof":
            p.next()
            oname = p.next()
            p.expect("{")
            members = []
            while p.peek() != "}":
                ftype = _parse_field_type(p)
                fname = p.next()
                p.expect("=")
                fnum = int(p.next())
                _skip_field_options(p)
                p.expect(";")
                members.append({"name": fname, "type": ftype, "number": fnum, "label": None})
            p.next()  # '}'
            msg["oneofs"][oname] = members
            msg["fields"].extend({**m, "oneof": oname} for m in members)
            continue
        label = None
        if t in ("repeated", "optional", "required"):
            label = p.next()
        ftype = _parse_field_type(p)
        fname = p.next()
        p.expect("=")
        fnum = int(p.next())
        opts = _skip_field_options(p)
        p.expect(";")
        msg["fields"].append(
            {"name": fname, "type": ftype, "number": fnum, "label": label, "options": opts}
        )
    return msg


def _skip_field_options(p: _Parser) -> dict:
    """Consume ``[k = v, ...]``; returns recognized options (e.g. the
    confluent.field_meta precision/scale params as a raw token list)."""
    opts: dict = {}
    if p.peek() != "[":
        return opts
    toks = []
    depth = 0
    while True:
        t = p.next()
        if t == "[":
            depth += 1
        elif t == "]":
            depth -= 1
            if depth == 0:
                break
        else:
            toks.append(t)
    toks = [t.strip('"') for t in toks]
    opts["raw"] = toks
    for i, t in enumerate(toks):
        if t in ("precision", "scale") and t not in opts:
            # the confluent.field_meta params style tokenizes as
            # key : "precision" , value : "8" — take the first numeric token
            # before the next key/closing brace
            for nxt in toks[i + 1 :]:
                if nxt in ("precision", "scale", "key", "}"):
                    break
                if nxt.lstrip("-").isdigit():
                    opts[t] = int(nxt)
                    break
    return opts


# ---------------------------------------------------------------------------
# descriptor resolution
# ---------------------------------------------------------------------------


class Descriptor:
    """Resolved message descriptor: field list with resolved types."""

    def __init__(self, name: str, fields: list[dict], oneofs: dict):
        self.name = name
        self.fields = fields
        self.oneofs = oneofs
        self.by_number = {f["number"]: f for f in fields}


def resolve(root: dict, message: str | None = None) -> Descriptor:
    """Resolve a message (default: first declared) against the parsed file,
    rejecting recursive message cycles (Context.java:75-81 equivalent).
    ``message`` may be a dotted nested name (``Outer.Inner``) — the form the
    Confluent message-index wire prefix selects (MessageIndexes)."""
    if not root["messages"]:
        raise ProtoSchemaError("no message in .proto")
    name = message or next(iter(root["messages"]))
    parts = name.split(".")
    scope: dict = root
    scopes: tuple = ()
    node: dict | None = None
    for p in parts:
        if p not in scope.get("messages", {}):
            raise ProtoSchemaError(f"message not found: {name}")
        node = scope["messages"][p]
        scopes = scopes + ((p, node),)
        scope = node
    # ancestors only: _resolve_message re-adds the target's own scope
    return _resolve_message(parts[-1], node, root, scopes=scopes[:-1], visiting=())


# ---------------------------------------------------------------------------
# Confluent message indexes (wire prefix selecting a message within the file)
# ---------------------------------------------------------------------------
#
# Confluent-framed Protobuf payloads carry, after the 5-byte magic+schema-id
# header, a zigzag-varint-encoded index path into the .proto file's message
# tree (io.confluent...protobuf.MessageIndexes, written by the reference at
# KwackEngine.java:460-468): varint count, then count varint indexes.  The
# common path [0] (first top-level message) is optimized to the single byte
# 0x00 (count 0 means [0]).


def read_message_indexes(data: bytes) -> tuple[list[int], bytes]:
    """Wire bytes (after the 5-byte header) -> (index path, message bytes)."""
    buf = io.BytesIO(data)
    count = _unzigzag(_read_varint(buf))
    if count == 0:
        return [0], data[buf.tell():]
    if count < 0 or count > 127:
        raise ProtoSchemaError(f"implausible message-index count: {count}")
    indexes = [_unzigzag(_read_varint(buf)) for _ in range(count)]
    if any(i < 0 for i in indexes):
        raise ProtoSchemaError(f"negative message index: {indexes}")
    return indexes, data[buf.tell():]


def write_message_indexes(indexes: list[int]) -> bytes:
    """Index path -> wire prefix (MessageIndexes.toByteArray equivalent)."""
    out = io.BytesIO()
    if indexes == [0]:
        out.write(b"\x00")
        return out.getvalue()
    _write_varint(out, _zigzag(len(indexes)))
    for i in indexes:
        _write_varint(out, _zigzag(i))
    return out.getvalue()


def message_for_indexes(root: dict, indexes: list[int]) -> str:
    """Index path -> dotted message name (ProtobufSchema.toMessageName)."""
    scope: dict = root
    parts: list[str] = []
    for i in indexes:
        names = list(scope.get("messages", {}))
        if i < 0 or i >= len(names):
            raise ProtoSchemaError(
                f"message index {i} out of range in {'.'.join(parts) or '<root>'}"
            )
        parts.append(names[i])
        scope = scope["messages"][names[i]]
    return ".".join(parts)


def indexes_for_message(root: dict, message: str) -> list[int]:
    """Dotted message name -> index path (ProtobufSchema.toMessageIndexes)."""
    scope: dict = root
    out: list[int] = []
    for part in message.split("."):
        names = list(scope.get("messages", {}))
        if part not in scope.get("messages", {}):
            raise ProtoSchemaError(f"message not found: {message}")
        out.append(names.index(part))
        scope = scope["messages"][part]
    return out


def _lookup(tname: str, scopes: tuple, root: dict) -> tuple[str, dict, str]:
    """Find tname among nested scopes then root; returns (kind, node, fullname)."""
    for scope_name, scope in reversed(scopes):
        if tname in scope.get("messages", {}):
            return "message", scope["messages"][tname], f"{scope_name}.{tname}"
        if tname in scope.get("enums", {}):
            return "enum", scope["enums"][tname], f"{scope_name}.{tname}"
    if tname in root["messages"]:
        return "message", root["messages"][tname], tname
    if tname in root["enums"]:
        return "enum", root["enums"][tname], tname
    # imported types last: local declarations shadow them
    if tname in root.get("imported_messages", {}):
        return "message", root["imported_messages"][tname], tname
    if tname in root.get("imported_enums", {}):
        return "enum", root["imported_enums"][tname], tname
    raise ProtoSchemaError(f"unknown type: {tname}")


def _resolve_message(
    name: str, node: dict, root: dict, scopes: tuple, visiting: tuple
) -> Descriptor:
    if name in visiting:
        raise ProtoSchemaError(f"recursive message schema: {name}")
    fields = []
    inner_scopes = scopes + ((name, node),)
    for f in node["fields"]:
        rf = dict(f)
        rf["resolved"] = _resolve_type(f["type"], root, inner_scopes, visiting + (name,))
        fields.append(rf)
    return Descriptor(name, fields, node["oneofs"])


def _resolve_type(ftype: Any, root: dict, scopes: tuple, visiting: tuple) -> dict:
    if isinstance(ftype, tuple) and ftype[0] == "map":
        _, kt, vt = ftype
        return {
            "kind": "map",
            "key": {"kind": "scalar", "type": kt},
            "value": _resolve_type(vt, root, scopes, visiting),
        }
    if ftype in SCALARS:
        return {"kind": "scalar", "type": ftype}
    if ftype in WRAPPERS:
        return {"kind": "wrapper", "type": WRAPPERS[ftype]}
    if ftype in ("google.protobuf.Timestamp", "google.protobuf.Duration",
                 "google.type.Date", "google.type.TimeOfDay", "confluent.type.Decimal"):
        return {"kind": "wkt", "type": ftype}
    kind, node, fullname = _lookup(ftype, scopes, root)
    if kind == "enum":
        return {"kind": "enum", "symbols": node["symbols"]}
    return {
        "kind": "message",
        "descriptor": _resolve_message(fullname, node, root, scopes, visiting),
    }


# ---------------------------------------------------------------------------
# descriptor -> Spark type
# ---------------------------------------------------------------------------


def _wkt_spark_type(t: str, options: dict | None = None) -> ST.DataType:
    if t == "google.protobuf.Timestamp":
        return ST.TimestampType()
    if t == "google.protobuf.Duration":
        return ST.DayTimeIntervalType()
    if t == "google.type.Date":
        return ST.DateType()
    if t == "google.type.TimeOfDay":
        return ST.LongType()  # micros since midnight
    if t == "confluent.type.Decimal":
        opts = options or {}
        return ST.DecimalType(opts.get("precision", 38), opts.get("scale", 0))
    raise ProtoSchemaError(t)


def _resolved_spark_type(r: dict, options: dict | None = None) -> ST.DataType:
    k = r["kind"]
    if k == "scalar" or k == "wrapper":
        return SCALARS[r["type"]]
    if k == "enum":
        return ST.StringType()
    if k == "wkt":
        return _wkt_spark_type(r["type"], options)
    if k == "map":
        return ST.MapType(SCALARS[r["key"]["type"]], _resolved_spark_type(r["value"]))
    if k == "message":
        return descriptor_struct_type(r["descriptor"])
    raise ProtoSchemaError(k)


def descriptor_struct_type(desc: Descriptor) -> ST.StructType:
    """Message -> StructType.  oneof members collapse into ONE union struct
    column named after the oneof (ProtobufTransformer.java:84-106)."""
    fields: list[ST.StructField] = []
    done_oneofs: set[str] = set()
    for f in desc.fields:
        oneof = f.get("oneof")
        if oneof:
            if oneof in done_oneofs:
                continue
            done_oneofs.add(oneof)
            members = desc.oneofs[oneof]
            branch_fields = [
                ST.StructField(
                    m["name"],
                    _resolved_spark_type(
                        next(x["resolved"] for x in desc.fields if x["name"] == m["name"]),
                        m.get("options"),
                    ),
                    nullable=True,
                )
                for m in members
            ]
            fields.append(ST.StructField(oneof, ST.StructType(branch_fields), True))
            continue
        t = _resolved_spark_type(f["resolved"], f.get("options"))
        if f.get("label") == "repeated" and f["resolved"]["kind"] != "map":
            t = ST.ArrayType(t)
            fields.append(ST.StructField(f["name"], t, False))  # absent -> []
            continue
        # proto3 nullability: scalars/enums/maps always materialize a value
        # (defaults substituted at decode); wrappers/messages/wkt can be NULL
        nullable = (
            f["resolved"]["kind"] in ("wrapper", "message", "wkt")
            or f.get("label") == "optional"
        )
        fields.append(ST.StructField(f["name"], t, nullable))
    return ST.StructType(fields)


def to_struct_type(
    proto_text: str,
    message: str | None = None,
    imports: dict[str, str] | None = None,
) -> ST.StructType:
    return descriptor_struct_type(resolve(parse_proto(proto_text, imports), message))


# ---------------------------------------------------------------------------
# wire-format decode
# ---------------------------------------------------------------------------


def _read_varint(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise ProtoSchemaError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not (b[0] & 0x80):
            return acc
        shift += 7


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _to_signed(n: int, bits: int) -> int:
    return n - (1 << bits) if n >= (1 << (bits - 1)) else n


_PACKABLE = {
    "double", "float", "int32", "int64", "uint32", "uint64", "sint32",
    "sint64", "fixed32", "fixed64", "sfixed32", "sfixed64", "bool",
}


def _decode_scalar_varint(t: str, v: int) -> Any:
    if t in ("int32", "int64"):
        return _to_signed(v, 64)
    if t in ("sint32", "sint64"):
        return _unzigzag(v)
    if t in ("uint32", "uint64"):
        return v
    if t == "bool":
        return bool(v)
    if t == "enum-int":
        return _to_signed(v, 32)
    raise ProtoSchemaError(f"varint for non-varint type {t}")


def decode_message(data: bytes, desc: Descriptor) -> dict:
    """Wire bytes -> {field_name: python value}; oneof resolution = last set
    field wins, recorded under '__oneof_<name>'."""
    buf = io.BytesIO(data)
    out: dict[str, Any] = {}
    end = len(data)
    while buf.tell() < end:
        tag = _read_varint(buf)
        fnum, wt = tag >> 3, tag & 7
        f = desc.by_number.get(fnum)
        # unknown field: skip per wire type
        if f is None:
            if wt == 0:
                _read_varint(buf)
            elif wt == 1:
                buf.read(8)
            elif wt == 2:
                buf.read(_read_varint(buf))
            elif wt == 5:
                buf.read(4)
            else:
                raise ProtoSchemaError(f"unsupported wire type {wt}")
            continue
        r = f["resolved"]
        repeated = f.get("label") == "repeated"
        value: Any
        if wt == 0:
            t = r["type"] if r["kind"] in ("scalar", "wrapper") else "enum-int"
            raw = _read_varint(buf)
            if r["kind"] == "enum":
                value = r["symbols"].get(_to_signed(raw, 32), str(raw))
            else:
                value = _decode_scalar_varint(t, raw)
        elif wt == 1:
            t = r["type"]
            b = buf.read(8)
            value = struct.unpack("<d", b)[0] if t == "double" else (
                _to_signed(int.from_bytes(b, "little"), 64) if t == "sfixed64"
                else int.from_bytes(b, "little")
            )
        elif wt == 5:
            t = r["type"]
            b = buf.read(4)
            value = struct.unpack("<f", b)[0] if t == "float" else (
                _to_signed(int.from_bytes(b, "little"), 32) if t == "sfixed32"
                else int.from_bytes(b, "little")
            )
        elif wt == 2:
            payload = buf.read(_read_varint(buf))
            if r["kind"] == "map":
                kv_desc = Descriptor(
                    "entry",
                    [
                        {"name": "key", "number": 1, "resolved": r["key"], "label": None},
                        {"name": "value", "number": 2, "resolved": r["value"], "label": None},
                    ],
                    {},
                )
                kv = decode_message(payload, kv_desc)
                out.setdefault(f["name"], {})[kv.get("key")] = kv.get("value")
                continue
            if r["kind"] == "message":
                value = decode_message(payload, r["descriptor"])
            elif r["kind"] in ("wrapper", "wkt"):
                value = _decode_wkt(payload, r)
            elif r["type"] == "string":
                value = payload.decode("utf-8")
            elif r["type"] == "bytes":
                value = payload
            elif repeated and r["type"] in _PACKABLE:
                # packed repeated scalars
                value = _decode_packed(payload, r["type"])
                out.setdefault(f["name"], []).extend(value)
                if f.get("oneof"):
                    out[f"__oneof_{f['oneof']}"] = f["name"]
                continue
            else:
                raise ProtoSchemaError(f"length-delimited for {r}")
        else:
            raise ProtoSchemaError(f"unsupported wire type {wt}")
        if repeated:
            out.setdefault(f["name"], []).append(value)
        else:
            out[f["name"]] = value
        if f.get("oneof"):
            out[f"__oneof_{f['oneof']}"] = f["name"]
    return out


def _decode_packed(payload: bytes, t: str) -> list:
    buf = io.BytesIO(payload)
    out = []
    n = len(payload)
    while buf.tell() < n:
        if t in ("double", "fixed64", "sfixed64"):
            b = buf.read(8)
            out.append(
                struct.unpack("<d", b)[0] if t == "double"
                else _to_signed(int.from_bytes(b, "little"), 64) if t == "sfixed64"
                else int.from_bytes(b, "little")
            )
        elif t in ("float", "fixed32", "sfixed32"):
            b = buf.read(4)
            out.append(
                struct.unpack("<f", b)[0] if t == "float"
                else _to_signed(int.from_bytes(b, "little"), 32) if t == "sfixed32"
                else int.from_bytes(b, "little")
            )
        else:
            out.append(_decode_scalar_varint(t if t != "bool" else "bool", _read_varint(buf)))
    return out


_WKT_FIELDS = {
    "google.protobuf.Timestamp": [("seconds", "int64", 1), ("nanos", "int32", 2)],
    "google.protobuf.Duration": [("seconds", "int64", 1), ("nanos", "int32", 2)],
    "google.type.Date": [("year", "int32", 1), ("month", "int32", 2), ("day", "int32", 3)],
    "google.type.TimeOfDay": [
        ("hours", "int32", 1), ("minutes", "int32", 2),
        ("seconds", "int32", 3), ("nanos", "int32", 4),
    ],
    "confluent.type.Decimal": [("value", "bytes", 1), ("precision", "uint32", 2), ("scale", "int32", 3)],
}


def _decode_wkt(payload: bytes, r: dict) -> Any:
    if r["kind"] == "wrapper":
        d = Descriptor("w", [{"name": "value", "number": 1,
                              "resolved": {"kind": "scalar", "type": r["type"]}, "label": None}], {})
        return decode_message(payload, d).get("value", _scalar_default(r["type"]))
    t = r["type"]
    fields = [
        {"name": n, "number": num, "resolved": {"kind": "scalar", "type": ft}, "label": None}
        for n, ft, num in _WKT_FIELDS[t]
    ]
    msg = decode_message(payload, Descriptor(t, fields, {}))
    return {"__wkt__": t, **msg}


def _scalar_default(t: str) -> Any:
    if t == "string":
        return ""
    if t == "bytes":
        return b""
    if t == "bool":
        return False
    if t in ("double", "float"):
        return 0.0
    return 0


# ---------------------------------------------------------------------------
# decoded message -> Spark row
# ---------------------------------------------------------------------------


def _coerce_wkt(v: dict | None, t: str, options: dict | None = None) -> Any:
    if v is None:
        return None
    if t == "google.protobuf.Timestamp":
        return _EPOCH + datetime.timedelta(
            seconds=v.get("seconds", 0), microseconds=v.get("nanos", 0) // 1000
        )
    if t == "google.protobuf.Duration":
        return datetime.timedelta(
            seconds=v.get("seconds", 0), microseconds=v.get("nanos", 0) // 1000
        )
    if t == "google.type.Date":
        return datetime.date(v.get("year", 1970), v.get("month", 1), v.get("day", 1))
    if t == "google.type.TimeOfDay":
        return (
            (v.get("hours", 0) * 3600 + v.get("minutes", 0) * 60 + v.get("seconds", 0))
            * 1_000_000
            + v.get("nanos", 0) // 1000
        )
    if t == "confluent.type.Decimal":
        scale = v.get("scale", (options or {}).get("scale", 0))
        unscaled = int.from_bytes(v.get("value", b"\x00"), "big", signed=True)
        return decimal.Decimal(unscaled).scaleb(-scale)
    raise ProtoSchemaError(t)


def _coerce_resolved(v: Any, r: dict, options: dict | None = None) -> Any:
    if r["kind"] == "wkt":
        return _coerce_wkt(v, r["type"], options)
    if v is None:
        return None
    if r["kind"] in ("scalar", "wrapper"):
        t = r["type"]
        if t in ("uint64", "fixed64"):
            return decimal.Decimal(v)
        return v
    if r["kind"] == "enum":
        return v
    if r["kind"] == "map":
        return {k: _coerce_resolved(x, r["value"]) for k, x in v.items()}
    if r["kind"] == "message":
        return message_to_row(v, r["descriptor"])
    raise ProtoSchemaError(r["kind"])


def message_to_row(msg: dict, desc: Descriptor) -> tuple:
    """Decoded dict -> row tuple matching descriptor_struct_type order."""
    out = []
    done_oneofs: set[str] = set()
    for f in desc.fields:
        oneof = f.get("oneof")
        if oneof:
            if oneof in done_oneofs:
                continue
            done_oneofs.add(oneof)
            set_field = msg.get(f"__oneof_{oneof}")
            members = desc.oneofs[oneof]
            if set_field is None:
                out.append(None)  # unset oneof -> NULL union
            else:
                branch = tuple(
                    _coerce_resolved(
                        msg.get(m["name"]),
                        next(x["resolved"] for x in desc.fields if x["name"] == m["name"]),
                        m.get("options"),
                    )
                    if m["name"] == set_field
                    else None
                    for m in members
                )
                out.append(branch)
            continue
        v = msg.get(f["name"])
        if f.get("label") == "repeated" and f["resolved"]["kind"] != "map":
            out.append(
                [_coerce_resolved(x, f["resolved"], f.get("options")) for x in (v or [])]
            )
        elif f["resolved"]["kind"] == "map" and v is None:
            out.append({})  # proto3: absent map = empty map
        elif f["resolved"]["kind"] == "enum" and v is None:
            # proto3 absent enum = the zero-numbered symbol
            out.append(f["resolved"]["symbols"].get(0))
        elif f["resolved"]["kind"] == "scalar" and v is None:
            # proto3 absent scalar = default value
            out.append(_coerce_resolved(_scalar_default(f["resolved"]["type"]), f["resolved"]))
        else:
            out.append(_coerce_resolved(v, f["resolved"], f.get("options")))
    return tuple(out)


def make_row_converter(
    proto_text: str,
    message: str | None = None,
    imports: dict[str, str] | None = None,
) -> tuple[ST.StructType, Callable[[bytes], tuple]]:
    desc = resolve(parse_proto(proto_text, imports), message)
    st = descriptor_struct_type(desc)

    def convert(payload: bytes) -> tuple:
        return message_to_row(decode_message(payload, desc), desc)

    return st, convert


# ---------------------------------------------------------------------------
# wire-format encode (tests + synthetic frames)
# ---------------------------------------------------------------------------


def _write_varint(out: io.BytesIO, v: int) -> None:
    if v < 0:
        v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def encode_field(out: io.BytesIO, fnum: int, r: dict, value: Any, options: dict | None = None) -> None:
    t = r.get("type")
    if r["kind"] == "enum":
        num = next(k for k, s in r["symbols"].items() if s == value)
        _write_varint(out, fnum << 3 | 0)
        _write_varint(out, num)
        return
    if r["kind"] in ("scalar", "wrapper"):
        if r["kind"] == "wrapper":
            inner = io.BytesIO()
            encode_field(inner, 1, {"kind": "scalar", "type": t}, value)
            payload = inner.getvalue()
            _write_varint(out, fnum << 3 | 2)
            _write_varint(out, len(payload))
            out.write(payload)
            return
        if t in ("int32", "int64", "uint32", "uint64", "bool"):
            _write_varint(out, fnum << 3 | 0)
            _write_varint(out, int(value))
        elif t in ("sint32", "sint64"):
            _write_varint(out, fnum << 3 | 0)
            _write_varint(out, _zigzag(int(value)))
        elif t in ("fixed64", "sfixed64", "double"):
            _write_varint(out, fnum << 3 | 1)
            out.write(
                struct.pack("<d", value) if t == "double"
                else int(value).to_bytes(8, "little", signed=t == "sfixed64")
            )
        elif t in ("fixed32", "sfixed32", "float"):
            _write_varint(out, fnum << 3 | 5)
            out.write(
                struct.pack("<f", value) if t == "float"
                else int(value).to_bytes(4, "little", signed=t == "sfixed32")
            )
        elif t == "string":
            b = value.encode("utf-8")
            _write_varint(out, fnum << 3 | 2)
            _write_varint(out, len(b))
            out.write(b)
        elif t == "bytes":
            _write_varint(out, fnum << 3 | 2)
            _write_varint(out, len(value))
            out.write(value)
        else:
            raise ProtoSchemaError(t)
        return
    if r["kind"] == "wkt":
        inner = io.BytesIO()
        for name, ft, num in _WKT_FIELDS[t]:
            if name in value:
                encode_field(inner, num, {"kind": "scalar", "type": ft}, value[name])
        payload = inner.getvalue()
        _write_varint(out, fnum << 3 | 2)
        _write_varint(out, len(payload))
        out.write(payload)
        return
    if r["kind"] == "map":
        for k, v in value.items():
            inner = io.BytesIO()
            encode_field(inner, 1, r["key"], k)
            encode_field(inner, 2, r["value"], v)
            payload = inner.getvalue()
            _write_varint(out, fnum << 3 | 2)
            _write_varint(out, len(payload))
            out.write(payload)
        return
    if r["kind"] == "message":
        payload = encode_message(value, r["descriptor"])
        _write_varint(out, fnum << 3 | 2)
        _write_varint(out, len(payload))
        out.write(payload)
        return
    raise ProtoSchemaError(r["kind"])


def encode_message(values: dict, desc: Descriptor) -> bytes:
    out = io.BytesIO()
    for f in desc.fields:
        name = f["name"]
        if name not in values or values[name] is None:
            continue
        v = values[name]
        if f.get("label") == "repeated" and f["resolved"]["kind"] != "map":
            for x in v:
                encode_field(out, f["number"], f["resolved"], x, f.get("options"))
        else:
            encode_field(out, f["number"], f["resolved"], v, f.get("options"))
    return out.getvalue()
