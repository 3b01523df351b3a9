"""Avro schema -> Spark StructType + pure-Python binary codec.

Capability parity with the reference's AvroTransformer
(/root/reference/src/main/java/io/kcache/kwack/transformer/avro/
AvroTransformer.java:37-243), re-expressed for Spark:

- schema -> type mapping per SURVEY.md §1.3 (records -> StructType, arrays ->
  ArrayType, maps -> MapType, enums -> StringType, decimal/date/time/
  timestamp logical types, uuid -> StringType, fixed/bytes -> BinaryType).
- nullable union [null, T] flattens to a nullable T (AvroTransformer.java:
  62-69); a multi-branch union becomes a struct of nullable branches named
  u0, u1, ... in branch order with exactly one non-null (AvroTransformer.
  java:70-83) — Spark has no UNION type; helpers in
  kwack_spark/functions/union.py recover tag/value.
- recursive record schemas are rejected (StructColumnDef.java:48-50,
  Context.java:75-81).
- binary decode implements the Avro 1.x binary encoding (zigzag varints,
  length-prefixed bytes, block-encoded arrays/maps) with writer->reader
  projection for schema evolution: records written with an older schema are
  decoded with their writer schema and projected to the reader's columns,
  missing fields taking the reader default / NULL (the behavior
  AvroTest.java:229-248 testSimpleEvolved asserts).

No external Avro library: schemas are plain JSON and the binary format is
~200 lines — keeping it in-repo makes the decode stage an ordinary
Arrow-batched Python function with no jar/package dependency.

TIME decision (SURVEY §1.3): time-millis/micros -> LongType micros since
midnight.  TIMESTAMP_NS: truncate to micros (TimestampType).
"""

from __future__ import annotations

import datetime
import decimal
import io
import json
import struct
from typing import Any, Callable

from pyspark.sql import types as ST

PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH = datetime.datetime(1970, 1, 1)


class AvroSchemaError(ValueError):
    pass


def parse_schema(
    schema: str | dict | list, prelude: tuple | list = ()
) -> Any:
    """Parse an Avro schema (JSON string or already-parsed), resolving named
    type references and rejecting recursive records.

    ``prelude``: schemas parsed FIRST into the shared named-type table, so
    the main schema may reference their record/enum/fixed names — the
    Confluent schema-references mechanism (a registered schema's
    ``references`` list names subjects whose types it uses; the reference
    resolves them transitively via its registry client,
    KwackEngine.java:194-203).  Order matters the same way registry
    resolution orders dependencies: dependencies first."""
    named: dict[str, Any] = {}
    for pre in prelude:
        pnode = json.loads(pre) if isinstance(pre, str) else pre
        _resolve(pnode, named, visiting=())
    node = json.loads(schema) if isinstance(schema, str) else schema
    resolved = _resolve(node, named, visiting=())
    return resolved


def _fullname(node: dict) -> str:
    name = node["name"]
    ns = node.get("namespace")
    if "." in name or not ns:
        return name
    return f"{ns}.{name}"


def _resolve(node: Any, named: dict, visiting: tuple) -> Any:
    """Normalize schema node; inline named-type references; recursion check."""
    if isinstance(node, str):
        if node in PRIMITIVES:
            return {"type": node}
        if node in visiting:
            raise AvroSchemaError(f"recursive schema reference: {node}")
        if node in named:
            return named[node]
        raise AvroSchemaError(f"unknown named type: {node}")
    if isinstance(node, list):  # union
        return {
            "type": "union",
            "branches": [_resolve(b, named, visiting) for b in node],
        }
    if not isinstance(node, dict):
        raise AvroSchemaError(f"invalid schema node: {node!r}")
    t = node["type"]
    if isinstance(t, (list, dict)):  # {"type": [...]} or nested def
        return _resolve(t, named, visiting)
    if t == "record":
        fn = _fullname(node)
        if fn in visiting or node["name"] in visiting:
            raise AvroSchemaError(f"recursive record schema: {fn}")
        out = dict(node)
        # two-name registration (short + full) mirrors Avro name resolution;
        # BOTH names go into `visiting` so a short-name self-reference inside
        # a namespaced record is still rejected, not resolved to the
        # partially-built dict (which would be a silent cycle)
        named[fn] = out
        named[node["name"]] = out
        out["fields"] = [
            {**f, "type": _resolve(f["type"], named, visiting + (fn, node["name"]))}
            for f in node["fields"]
        ]
        return out
    if t in ("enum", "fixed"):
        out = dict(node)
        named[_fullname(node)] = out
        named[node["name"]] = out
        return out
    if t == "array":
        return {**node, "items": _resolve(node["items"], named, visiting)}
    if t == "map":
        return {**node, "values": _resolve(node["values"], named, visiting)}
    if t in PRIMITIVES:
        return dict(node)
    if t in named:  # named reference spelled as {"type": "Name"}
        if t in visiting:
            raise AvroSchemaError(f"recursive schema reference: {t}")
        return named[t]
    raise AvroSchemaError(f"unsupported avro type: {t}")


# ---------------------------------------------------------------------------
# schema -> Spark type
# ---------------------------------------------------------------------------


def _is_null(node: Any) -> bool:
    return isinstance(node, dict) and node.get("type") == "null"


def nullable_unwrap(node: dict) -> tuple[dict, bool]:
    """[null, T] (either order) -> (T, nullable=True); else (node, False)."""
    if node.get("type") == "union":
        branches = node["branches"]
        non_null = [b for b in branches if not _is_null(b)]
        if len(non_null) == 1:
            return non_null[0], len(non_null) != len(branches)
        return node, any(_is_null(b) for b in branches)
    return node, False


def to_spark_type(node: dict) -> ST.DataType:
    """Avro schema node -> Spark DataType (SURVEY §1.3 matrix)."""
    node, _ = nullable_unwrap(node)
    t = node.get("type")
    logical = node.get("logicalType")
    if t == "union":
        # struct-of-branches: u<i> per non-null branch, in branch order
        fields = [
            ST.StructField(f"u{i}", to_spark_type(b), nullable=True)
            for i, b in enumerate(b for b in node["branches"] if not _is_null(b))
        ]
        return ST.StructType(fields)
    if t == "record":
        return ST.StructType(
            [
                ST.StructField(
                    f["name"],
                    to_spark_type(f["type"]),
                    nullable=_field_nullable(f["type"]),
                )
                for f in node["fields"]
            ]
        )
    if t == "array":
        return ST.ArrayType(to_spark_type(node["items"]), containsNull=_field_nullable(node["items"]))
    if t == "map":
        return ST.MapType(ST.StringType(), to_spark_type(node["values"]), valueContainsNull=_field_nullable(node["values"]))
    if t == "enum":
        return ST.StringType()
    if t == "fixed":
        if logical == "decimal":
            return ST.DecimalType(node["precision"], node.get("scale", 0))
        if logical == "duration":
            # lossless struct; Avro duration carries months which Spark's
            # DayTimeIntervalType cannot represent
            return ST.StructType(
                [
                    ST.StructField("months", ST.IntegerType(), False),
                    ST.StructField("days", ST.IntegerType(), False),
                    ST.StructField("millis", ST.LongType(), False),
                ]
            )
        return ST.BinaryType()
    if t == "bytes":
        if logical == "decimal":
            return ST.DecimalType(node["precision"], node.get("scale", 0))
        return ST.BinaryType()
    if t == "string":
        return ST.StringType()  # uuid logical type included
    if t == "int":
        if logical == "date":
            return ST.DateType()
        if logical == "time-millis":
            return ST.LongType()  # micros since midnight
        return ST.IntegerType()
    if t == "long":
        if logical in ("timestamp-millis", "timestamp-micros", "timestamp-nanos"):
            return ST.TimestampType()
        if logical == "time-micros":
            return ST.LongType()
        return ST.LongType()
    if t == "float":
        return ST.FloatType()
    if t == "double":
        return ST.DoubleType()
    if t == "boolean":
        return ST.BooleanType()
    if t == "null":
        return ST.StringType()  # NULL-only column; nullable string carrier
    raise AvroSchemaError(f"unsupported avro type: {t}")


def _field_nullable(node: dict) -> bool:
    _, nullable = nullable_unwrap(node)
    return nullable or node.get("type") == "null"


def to_struct_type(schema: str | dict, prelude: tuple | list = ()) -> ST.StructType:
    """Top-level entry: record schema -> StructType (flattened per the
    reference's table layout, KwackEngine.java:607-617); non-record schemas
    become a single ``rowval`` column (KwackEngine.java:123,619)."""
    node = parse_schema(schema, prelude)
    base, _ = nullable_unwrap(node)
    if base.get("type") == "record":
        return to_spark_type(base)  # type: ignore[return-value]
    return ST.StructType(
        [ST.StructField("rowval", to_spark_type(node), nullable=True)]
    )


# ---------------------------------------------------------------------------
# binary decode (Avro 1.x binary encoding)
# ---------------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf",)

    def __init__(self, data: bytes):
        self.buf = io.BytesIO(data)

    def read(self, n: int) -> bytes:
        b = self.buf.read(n)
        if len(b) != n:
            raise AvroSchemaError("truncated avro payload")
        return b

    def zigzag(self) -> int:
        shift, acc = 0, 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def boolean(self) -> bool:
        return self.read(1)[0] != 0

    def float4(self) -> float:
        return struct.unpack("<f", self.read(4))[0]

    def float8(self) -> float:
        return struct.unpack("<d", self.read(8))[0]

    def bytes_(self) -> bytes:
        return self.read(self.zigzag())

    def string(self) -> str:
        return self.bytes_().decode("utf-8")


def _decode_node(r: _Reader, node: dict) -> Any:
    t = node["type"]
    if t == "null":
        return None
    if t == "boolean":
        return r.boolean()
    if t in ("int", "long"):
        return r.zigzag()
    if t == "float":
        return r.float4()
    if t == "double":
        return r.float8()
    if t == "bytes":
        return r.bytes_()
    if t == "string":
        return r.string()
    if t == "fixed":
        return r.read(node["size"])
    if t == "enum":
        idx = r.zigzag()
        symbols = node["symbols"]
        if not 0 <= idx < len(symbols):
            raise AvroSchemaError(f"enum index {idx} out of range")
        return symbols[idx]
    if t == "array":
        out = []
        while True:
            n = r.zigzag()
            if n == 0:
                break
            if n < 0:
                r.zigzag()  # block byte size, unused
                n = -n
            for _ in range(n):
                out.append(_decode_node(r, node["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.zigzag()
            if n == 0:
                break
            if n < 0:
                r.zigzag()
                n = -n
            for _ in range(n):
                k = r.string()
                out[k] = _decode_node(r, node["values"])
        return out
    if t == "union":
        idx = r.zigzag()
        branches = node["branches"]
        if not 0 <= idx < len(branches):
            raise AvroSchemaError(f"union index {idx} out of range")
        return _UnionValue(idx, _decode_node(r, branches[idx]))
    if t == "record":
        return {f["name"]: _decode_node(r, f["type"]) for f in node["fields"]}
    raise AvroSchemaError(f"cannot decode type: {t}")


class _UnionValue:
    """Decoded union payload tagged with its writer branch index."""

    __slots__ = ("index", "value")

    def __init__(self, index: int, value: Any):
        self.index = index
        self.value = value


def decode(data: bytes, writer_schema: dict) -> Any:
    """Decode one Avro binary payload with its writer schema."""
    return _decode_node(_Reader(data), writer_schema)


# ---------------------------------------------------------------------------
# decoded value -> Spark row value (coercion per logical type)
# ---------------------------------------------------------------------------


def _coerce(value: Any, node: dict) -> Any:
    if value is None:
        return None
    node, _ = nullable_unwrap(node)
    t = node.get("type")
    logical = node.get("logicalType")
    if t == "union":
        non_null = [b for b in node["branches"] if not _is_null(b)]
        out = [None] * len(non_null)
        if isinstance(value, _UnionValue):
            branch = node["branches"][value.index]
            if _is_null(branch):
                return None
            pos = sum(1 for b in node["branches"][: value.index] if not _is_null(b))
            out[pos] = _coerce(value.value, branch)
        return tuple(out)
    if isinstance(value, _UnionValue):  # [null,T] flattened
        value = value.value
        if value is None:
            return None
    if t == "record":
        return tuple(_coerce(value.get(f["name"]), f["type"]) for f in node["fields"])
    if t == "array":
        return [_coerce(v, node["items"]) for v in value]
    if t == "map":
        return {k: _coerce(v, node["values"]) for k, v in value.items()}
    if t in ("bytes", "fixed"):
        if logical == "decimal":
            scale = node.get("scale", 0)
            unscaled = int.from_bytes(value, "big", signed=True)
            return decimal.Decimal(unscaled).scaleb(-scale)
        if logical == "duration" and t == "fixed":
            months, days, millis = struct.unpack("<III", value)
            return (months, days, millis)
        return bytes(value)
    if t == "int":
        if logical == "date":
            return _EPOCH_DATE + datetime.timedelta(days=value)
        if logical == "time-millis":
            return value * 1000  # micros since midnight
        return value
    if t == "long":
        if logical == "timestamp-millis":
            return _EPOCH + datetime.timedelta(milliseconds=value)
        if logical == "timestamp-micros":
            return _EPOCH + datetime.timedelta(microseconds=value)
        if logical == "timestamp-nanos":
            return _EPOCH + datetime.timedelta(microseconds=value // 1000)
        return value  # time-micros stays long
    return value


def project(decoded: Any, writer: dict, reader: dict) -> Any:
    """Writer -> reader projection for evolution: reader fields take the
    writer's value by name, else the reader default, else None
    (AvroTest.java:229-248 semantics)."""
    w, _ = nullable_unwrap(writer)
    rd, _ = nullable_unwrap(reader)
    if rd.get("type") != "record" or w.get("type") != "record":
        return decoded
    w_fields = {f["name"]: f for f in w["fields"]}
    out = {}
    for f in rd["fields"]:
        name = f["name"]
        if isinstance(decoded, dict) and name in decoded and name in w_fields:
            out[name] = decoded[name]
        elif "default" in f:
            out[name] = f["default"]
        else:
            out[name] = None
    return out


def make_row_converter(
    schema: str | dict, prelude: tuple | list = ()
) -> tuple[ST.StructType, Callable[[bytes, dict | None], tuple]]:
    """Returns (StructType, fn(payload, writer_schema|None) -> row tuple).

    ``writer_schema`` permits per-record writer resolution (schema id from
    the Confluent frame); None means the payload was written with the reader
    schema itself.  ``prelude``: referenced schemas (see parse_schema)."""
    reader = parse_schema(schema, prelude)
    base, _ = nullable_unwrap(reader)
    st = to_struct_type(schema, prelude)
    flat_record = base.get("type") == "record"

    def convert(payload: bytes, writer: dict | None = None) -> tuple:
        w = writer or reader
        # decode with the FULL writer schema: a top-level [null, T] union is
        # encoded with its branch-index varint, which unwrapping would skip
        decoded = decode(payload, w)
        if isinstance(decoded, _UnionValue) and w.get("type") == "union":
            branch = w["branches"][decoded.index]
            non_null = [b for b in w["branches"] if not _is_null(b)]
            if _is_null(branch):
                decoded = None
            elif len(non_null) == 1:
                # [null, T]: flattens to nullable T — unwrap for project/_coerce
                decoded = decoded.value
            # multi-branch union: keep the _UnionValue; _coerce builds the
            # struct-of-branches from its index
        if writer is not None and writer is not reader:
            decoded = project(decoded, writer, reader)
        if flat_record:
            if decoded is None:  # null branch of a nullable top-level union
                return tuple(None for _ in base["fields"])
            return _coerce(decoded, base)  # already a tuple of field values
        return (_coerce(decoded, reader),)

    return st, convert


# ---------------------------------------------------------------------------
# binary encode (tests + synthetic frame generation; inverse of decode)
# ---------------------------------------------------------------------------


def _zz(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else (((-n) << 1) - 1)


def _encode_varint(out: io.BytesIO, n: int) -> None:
    u = _zz(n)
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _encode_node(out: io.BytesIO, value: Any, node: dict) -> None:
    t = node["type"]
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _encode_varint(out, value)
    elif t == "float":
        out.write(struct.pack("<f", value))
    elif t == "double":
        out.write(struct.pack("<d", value))
    elif t == "bytes":
        _encode_varint(out, len(value))
        out.write(value)
    elif t == "string":
        b = value.encode("utf-8")
        _encode_varint(out, len(b))
        out.write(b)
    elif t == "fixed":
        out.write(value)
    elif t == "enum":
        _encode_varint(out, node["symbols"].index(value))
    elif t == "array":
        if value:
            _encode_varint(out, len(value))
            for v in value:
                _encode_node(out, v, node["items"])
        _encode_varint(out, 0)
    elif t == "map":
        if value:
            _encode_varint(out, len(value))
            for k, v in value.items():
                kb = k.encode("utf-8")
                _encode_varint(out, len(kb))
                out.write(kb)
                _encode_node(out, v, node["values"])
        _encode_varint(out, 0)
    elif t == "union":
        idx, v = value  # caller passes (branch_index, value)
        _encode_varint(out, idx)
        _encode_node(out, v, node["branches"][idx])
    elif t == "record":
        for f in node["fields"]:
            _encode_node(out, value[f["name"]], f["type"])
    else:
        raise AvroSchemaError(f"cannot encode type: {t}")


def encode(value: Any, schema: str | dict) -> bytes:
    """Encode a Python value as Avro binary (unions as (index, value))."""
    node = parse_schema(schema)
    out = io.BytesIO()
    _encode_node(out, value, node)
    return out.getvalue()
