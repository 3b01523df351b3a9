"""Protobuf transformer/codec tests mirroring the reference matrix
(ProtobufTest.java:38-120 all scalar types/unsigned/enum/oneof/repeated/map/
well-known types; proto fixture src/test/proto/Complex.proto:15-51)."""

import datetime
import decimal

import pytest
from pyspark.sql import types as ST

from kwack_spark.schema import protobuf as pb

COMPLEX_PROTO = """
syntax = "proto3";
package ex;

message Complex {
  string name = 1;
  int32 i32 = 2;
  sint32 si32 = 3;
  uint32 u32 = 4;
  int64 i64 = 5;
  uint64 u64 = 6;
  fixed32 f32 = 7;
  sfixed64 sf64 = 8;
  float fl = 9;
  double db = 10;
  bool bo = 11;
  bytes by = 12;
  Color color = 13;
  repeated int32 nums = 14;
  repeated Inner inners = 15;
  map<string, Inner> attrs = 16;
  oneof choice {
    string s_val = 17;
    int32 i_val = 18;
  }
  google.protobuf.Timestamp ts = 19;
  google.type.Date dt = 20;
  Inner nested = 21;

  message Inner {
    int32 x = 1;
  }
}

enum Color {
  RED = 0;
  GREEN = 1;
  BLUE = 2;
}
"""


def test_struct_type():
    st = pb.to_struct_type(COMPLEX_PROTO, "Complex")
    assert st["name"].dataType == ST.StringType()
    assert st["i32"].dataType == ST.IntegerType()
    assert st["si32"].dataType == ST.IntegerType()
    assert st["u32"].dataType == ST.LongType()
    assert st["u64"].dataType == ST.DecimalType(20, 0)
    assert st["fl"].dataType == ST.FloatType()
    assert st["color"].dataType == ST.StringType()
    assert st["nums"].dataType == ST.ArrayType(ST.IntegerType())
    assert isinstance(st["inners"].dataType, ST.ArrayType)
    assert isinstance(st["attrs"].dataType, ST.MapType)
    # oneof -> single union struct column named 'choice'
    choice = st["choice"].dataType
    assert isinstance(choice, ST.StructType)
    assert [f.name for f in choice.fields] == ["s_val", "i_val"]
    assert st["ts"].dataType == ST.TimestampType()
    assert st["dt"].dataType == ST.DateType()
    assert isinstance(st["nested"].dataType, ST.StructType)
    # oneof members must not surface as top-level columns
    assert "s_val" not in [f.name for f in st.fields]


def test_roundtrip():
    desc = pb.resolve(pb.parse_proto(COMPLEX_PROTO), "Complex")
    values = {
        "name": "n1",
        "i32": -5,
        "si32": -6,
        "u32": 4_000_000_000,
        "i64": 1 << 40,
        "u64": (1 << 63) + 5,
        "f32": 7,
        "sf64": -8,
        "fl": 0.5,
        "db": 2.25,
        "bo": True,
        "by": b"\x00\x01",
        "color": "BLUE",
        "nums": [1, 2, 3],
        "inners": [{"x": 1}, {"x": 2}],
        "attrs": {"a": {"x": 10}},
        "s_val": "chosen",
        "ts": {"seconds": 1_600_000_000, "nanos": 500_000_000},
        "dt": {"year": 2021, "month": 3, "day": 14},
        "nested": {"x": 42},
    }
    payload = pb.encode_message(values, desc)
    st, convert = pb.make_row_converter(COMPLEX_PROTO, "Complex")
    row = convert(payload)
    named = dict(zip([f.name for f in st.fields], row))
    assert named["name"] == "n1" and named["i32"] == -5 and named["si32"] == -6
    assert named["u32"] == 4_000_000_000
    assert named["u64"] == decimal.Decimal((1 << 63) + 5)
    assert named["sf64"] == -8 and named["bo"] is True
    assert named["color"] == "BLUE"
    assert named["nums"] == [1, 2, 3]
    assert named["inners"] == [(1,), (2,)]
    assert named["attrs"] == {"a": (10,)}
    assert named["choice"] == ("chosen", None)
    assert named["ts"] == datetime.datetime(2020, 9, 13, 12, 26, 40, 500000)
    assert named["dt"] == datetime.date(2021, 3, 14)
    assert named["nested"] == (42,)


def test_proto3_scalar_defaults():
    """Absent proto3 scalars decode to their defaults, absent messages to
    NULL, unset oneof to NULL (ProtobufTransformer unset-oneof semantics)."""
    desc = pb.resolve(pb.parse_proto(COMPLEX_PROTO), "Complex")
    payload = pb.encode_message({"name": "only"}, desc)
    st, convert = pb.make_row_converter(COMPLEX_PROTO, "Complex")
    named = dict(zip([f.name for f in st.fields], convert(payload)))
    assert named["name"] == "only"
    assert named["i32"] == 0 and named["bo"] is False and named["by"] == b""
    assert named["nums"] == [] and named["nested"] is None
    assert named["choice"] is None
    assert named["ts"] is None


def test_oneof_int_branch():
    desc = pb.resolve(pb.parse_proto(COMPLEX_PROTO), "Complex")
    payload = pb.encode_message({"i_val": 9}, desc)
    st, convert = pb.make_row_converter(COMPLEX_PROTO, "Complex")
    named = dict(zip([f.name for f in st.fields], convert(payload)))
    assert named["choice"] == (None, 9)


def test_wrapper_unwrap():
    proto = """
    syntax = "proto3";
    message W { google.protobuf.Int32Value v = 1; string s = 2; }
    """
    st = pb.to_struct_type(proto, "W")
    assert st["v"].dataType == ST.IntegerType() and st["v"].nullable
    desc = pb.resolve(pb.parse_proto(proto), "W")
    payload = pb.encode_message({"v": 5, "s": "x"}, desc)
    _, convert = pb.make_row_converter(proto, "W")
    assert convert(payload) == (5, "x")
    payload2 = pb.encode_message({"s": "y"}, desc)
    assert convert(payload2) == (None, "y")


def test_recursion_rejected():
    proto = """
    syntax = "proto3";
    message Node { Node next = 1; int32 v = 2; }
    """
    with pytest.raises(pb.ProtoSchemaError, match="recursive"):
        pb.to_struct_type(proto, "Node")


def test_decimal_wkt():
    proto = """
    syntax = "proto3";
    message D { confluent.type.Decimal amount = 1 [(confluent.field_meta) = { params: [ { key: "precision", value: "8" }, { key: "scale", value: "2" } ] }]; }
    """
    desc = pb.resolve(pb.parse_proto(proto), "D")
    payload = pb.encode_message(
        {"amount": {"value": (12345).to_bytes(3, "big", signed=True), "scale": 2}}, desc
    )
    _, convert = pb.make_row_converter(proto, "D")
    assert convert(payload) == (decimal.Decimal("123.45"),)


def test_decimal_field_meta_precision_scale():
    """Declared precision/scale from confluent.field_meta reach the Spark
    type (regression: the option token scan previously stopped short)."""
    proto = """
    syntax = "proto3";
    message D { confluent.type.Decimal amount = 1 [(confluent.field_meta) = { params: [ { key: "precision", value: "8" }, { key: "scale", value: "2" } ] }]; }
    """
    st = pb.to_struct_type(proto, "D")
    assert st["amount"].dataType == ST.DecimalType(8, 2)


def test_absent_enum_defaults_to_zero_symbol():
    proto = """
    syntax = "proto3";
    message E { Color c = 1; int32 x = 2; }
    enum Color { NONE = 0; RED = 1; }
    """
    desc = pb.resolve(pb.parse_proto(proto), "E")
    payload = pb.encode_message({"x": 1}, desc)
    _, convert = pb.make_row_converter(proto, "E")
    assert convert(payload) == ("NONE", 1)


def test_proto3_nullability_flags():
    st = pb.to_struct_type(COMPLEX_PROTO, "Complex")
    assert not st["name"].nullable and not st["i32"].nullable  # scalars
    assert not st["color"].nullable                            # enum
    assert not st["nums"].nullable                             # repeated -> []
    assert st["nested"].nullable and st["ts"].nullable         # message/wkt


# ---------------------------------------------------------------------------
# Confluent message indexes (MessageIndexes wire prefix)
# ---------------------------------------------------------------------------

MULTI_PROTO = """
syntax = "proto3";
message First { int32 a = 1; }
message Second { int64 b = 1; string s = 2; }
message Third {
  message Nested { string inner = 1; }
  int32 c = 1;
}
"""


def test_message_indexes_roundtrip_optimized_zero():
    # [0] is the single-byte 0x00 optimization
    assert pb.write_message_indexes([0]) == b"\x00"
    idx, rest = pb.read_message_indexes(b"\x00payload")
    assert idx == [0] and rest == b"payload"


def test_message_indexes_roundtrip_second_message():
    wire = pb.write_message_indexes([1]) + b"xyz"
    # zigzag varints: count 1 -> 0x02, index 1 -> 0x02
    assert wire.startswith(b"\x02\x02")
    idx, rest = pb.read_message_indexes(wire)
    assert idx == [1] and rest == b"xyz"


def test_message_indexes_roundtrip_nested():
    wire = pb.write_message_indexes([2, 0]) + b"m"
    idx, rest = pb.read_message_indexes(wire)
    assert idx == [2, 0] and rest == b"m"


def test_message_index_name_mapping():
    root = pb.parse_proto(MULTI_PROTO)
    assert pb.message_for_indexes(root, [0]) == "First"
    assert pb.message_for_indexes(root, [1]) == "Second"
    assert pb.message_for_indexes(root, [2, 0]) == "Third.Nested"
    assert pb.indexes_for_message(root, "First") == [0]
    assert pb.indexes_for_message(root, "Second") == [1]
    assert pb.indexes_for_message(root, "Third.Nested") == [2, 0]
    with pytest.raises(pb.ProtoSchemaError):
        pb.message_for_indexes(root, [5])
    with pytest.raises(pb.ProtoSchemaError):
        pb.indexes_for_message(root, "Nope")


def test_resolve_dotted_nested_message():
    # nested message selected by its dotted name decodes end-to-end
    st, convert = pb.make_row_converter(MULTI_PROTO, "Third.Nested")
    assert st.fieldNames() == ["inner"]
    desc = pb.resolve(pb.parse_proto(MULTI_PROTO), "Third.Nested")
    body = pb.encode_message({"inner": "hi"}, desc)
    assert convert(body) == ("hi",)


def test_decode_topic_validates_message_index():
    """Mismatched wire index path raises instead of silently mis-decoding."""
    from kwack_spark.config import Serde
    from kwack_spark.sources import kafka as ks

    _, conv, _ = ks.resolve_serde(
        Serde(kind="proto", schema_str=MULTI_PROTO, message="Second"),
        "t", False, None,
    )
    root = pb.parse_proto(MULTI_PROTO)
    desc = pb.resolve(root, "Second")
    body = pb.encode_message({"b": 7, "s": "ok"}, desc)
    good = ks.confluent_frame(pb.write_message_indexes([1]) + body, 9)
    assert conv(good, {}) == (7, "ok")
    bad = ks.confluent_frame(pb.write_message_indexes([0]) + body, 9)
    with pytest.raises(ValueError, match="message-index mismatch"):
        conv(bad, {})
    # bare (non-Confluent) payloads carry no index prefix
    assert conv(body, {}) == (7, "ok")


def test_import_weak_is_tolerated():
    """'import weak "x.proto";' is valid proto syntax and must parse (the
    import handler accepts the weak modifier like public)."""
    schema = 'syntax = "proto3"; import weak "legacy.proto"; message M { int32 x = 1; }'
    root = pb.parse_proto(schema)
    assert "M" in root["messages"]
