"""Avro transformer/codec tests mirroring the reference fixture matrix
(AvroTest.java:104-154 complex schema, :229-248 evolution, :300-313 nullable
union; JsonSchemaTest.java:154-162-style recursion rejection)."""

import datetime
import decimal

import pytest
from pyspark.sql import types as ST

from kwack_spark.schema import avro

SIMPLE = {
    "type": "record",
    "name": "Simple",
    "fields": [
        {"name": "f1", "type": "int"},
        {"name": "f2", "type": "string"},
        {"name": "f3", "type": "double"},
        {"name": "f4", "type": "long"},
    ],
}

COMPLEX = {
    "type": "record",
    "name": "Complex",
    "namespace": "ex",
    "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "by", "type": "bytes"},
        {"name": "fx", "type": {"type": "fixed", "name": "Fx", "size": 4}},
        {"name": "en", "type": {"type": "enum", "name": "En", "symbols": ["A", "B", "C"]}},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
        {"name": "mp", "type": {"type": "map", "values": "string"}},
        {
            "name": "dec",
            "type": {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2},
        },
        {"name": "dt", "type": {"type": "int", "logicalType": "date"}},
        {"name": "tm", "type": {"type": "int", "logicalType": "time-millis"}},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}},
        {"name": "uid", "type": {"type": "string", "logicalType": "uuid"}},
        {"name": "opt", "type": ["null", "string"]},
        {"name": "uni", "type": ["null", "int", "string"]},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "Nested",
                "fields": [{"name": "x", "type": "int"}],
            },
        },
    ],
}


def test_simple_struct_type():
    st = avro.to_struct_type(SIMPLE)
    assert [f.name for f in st.fields] == ["f1", "f2", "f3", "f4"]
    assert st["f1"].dataType == ST.IntegerType()
    assert st["f2"].dataType == ST.StringType()
    assert st["f3"].dataType == ST.DoubleType()
    assert st["f4"].dataType == ST.LongType()


def test_complex_struct_type():
    st = avro.to_struct_type(COMPLEX)
    assert st["en"].dataType == ST.StringType()
    assert st["arr"].dataType == ST.ArrayType(ST.IntegerType(), False)
    assert st["mp"].dataType == ST.MapType(ST.StringType(), ST.StringType(), False)
    assert st["dec"].dataType == ST.DecimalType(10, 2)
    assert st["dt"].dataType == ST.DateType()
    assert st["tm"].dataType == ST.LongType()
    assert st["ts"].dataType == ST.TimestampType()
    assert st["opt"].dataType == ST.StringType() and st["opt"].nullable
    # multi-branch union -> struct of nullable branches u0/u1
    uni = st["uni"].dataType
    assert isinstance(uni, ST.StructType)
    assert [f.name for f in uni.fields] == ["u0", "u1"]
    assert uni["u0"].dataType == ST.IntegerType()
    assert uni["u1"].dataType == ST.StringType()
    assert isinstance(st["nested"].dataType, ST.StructType)


def test_roundtrip_simple():
    value = {"f1": 42, "f2": "hello", "f3": 2.5, "f4": -7}
    payload = avro.encode(value, SIMPLE)
    st, convert = avro.make_row_converter(SIMPLE)
    assert convert(payload) == (42, "hello", 2.5, -7)


def test_roundtrip_complex_values():
    value = {
        "b": True,
        "i": -123,
        "l": 1 << 40,
        "f": 0.5,
        "d": 3.25,
        "s": "héllo",
        "by": b"\x01\x02",
        "fx": b"abcd",
        "en": "B",
        "arr": [1, 2, 3],
        "mp": {"k1": "v1", "k2": "v2"},
        "dec": (12345).to_bytes(3, "big", signed=True),
        "dt": 19000,
        "tm": 12 * 3600 * 1000,
        "ts": 1_600_000_000_000,
        "uid": "0000-111",
        "opt": (1, "present"),
        "uni": (2, "strval"),
        "nested": {"x": 9},
    }
    payload = avro.encode(value, COMPLEX)
    st, convert = avro.make_row_converter(COMPLEX)
    row = convert(payload)
    named = dict(zip([f.name for f in st.fields], row))
    assert named["b"] is True and named["i"] == -123 and named["l"] == 1 << 40
    assert named["s"] == "héllo" and named["by"] == b"\x01\x02"
    assert named["fx"] == b"abcd" and named["en"] == "B"
    assert named["arr"] == [1, 2, 3] and named["mp"]["k2"] == "v2"
    assert named["dec"] == decimal.Decimal("123.45")
    assert named["dt"] == datetime.date(1970, 1, 1) + datetime.timedelta(days=19000)
    assert named["tm"] == 12 * 3600 * 1000 * 1000  # micros since midnight
    assert named["ts"] == datetime.datetime(2020, 9, 13, 12, 26, 40)
    assert named["opt"] == "present"  # [null,T] flattened
    assert named["uni"] == (None, "strval")  # branch u1 set
    assert named["nested"] == (9,)


def test_union_null_branch():
    value = {"f1": 1, "f2": "x", "f3": 0.0, "f4": 0}
    sch = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "o", "type": ["null", "int"]}],
    }
    p_null = avro.encode({"o": (0, None)}, sch)
    p_set = avro.encode({"o": (1, 5)}, sch)
    _, convert = avro.make_row_converter(sch)
    assert convert(p_null) == (None,)
    assert convert(p_set) == (5,)


def test_evolution_projection():
    """Old-writer records project through the evolved reader: missing field
    gets the reader default (AvroTest.java testSimpleEvolved)."""
    writer = avro.parse_schema(SIMPLE)
    evolved = {
        "type": "record",
        "name": "Simple",
        "fields": SIMPLE["fields"] + [{"name": "f5", "type": ["null", "string"], "default": None}],
    }
    payload = avro.encode({"f1": 1, "f2": "a", "f3": 1.0, "f4": 2}, SIMPLE)
    st, convert = avro.make_row_converter(evolved)
    row = convert(payload, writer)
    assert row == (1, "a", 1.0, 2, None)


def test_recursion_rejected():
    rec = {
        "type": "record",
        "name": "Node",
        "fields": [{"name": "next", "type": ["null", "Node"]}],
    }
    with pytest.raises(avro.AvroSchemaError, match="recursive"):
        avro.parse_schema(rec)


def test_non_record_schema_gets_rowval():
    st = avro.to_struct_type({"type": "string"})
    assert [f.name for f in st.fields] == ["rowval"]
    _, convert = avro.make_row_converter({"type": "string"})
    assert convert(avro.encode("plain", {"type": "string"})) == ("plain",)


def test_dag_not_recursive_allowed():
    """Diamond reuse of a named type is legal (ProtobufTransformer caches by
    fullname, Context.java:35-41) — only cycles are rejected."""
    sch = {
        "type": "record",
        "name": "Top",
        "fields": [
            {
                "name": "a",
                "type": {
                    "type": "record",
                    "name": "Leaf",
                    "fields": [{"name": "v", "type": "int"}],
                },
            },
            {"name": "b", "type": "Leaf"},
        ],
    }
    st = avro.to_struct_type(sch)
    assert isinstance(st["b"].dataType, ST.StructType)


def test_top_level_nullable_union_roundtrip():
    """A [null, record] subject schema (registry-common): the writer emits a
    union branch index before the record body; decode must consume it."""
    rec = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "a", "type": "int"}, {"name": "b", "type": "string"}],
    }
    top = ["null", rec]
    st, convert = avro.make_row_converter(top)
    payload = avro.encode((1, {"a": 7, "b": "hi"}), top)
    assert convert(payload) == (7, "hi")
    null_payload = avro.encode((0, None), top)
    assert convert(null_payload) == (None, None)


def test_short_name_recursion_in_namespace_rejected():
    """Short-name self-reference inside a namespaced record is a cycle and
    must be rejected (not resolved into a RecursionError later)."""
    rec = {
        "type": "record",
        "name": "Node",
        "namespace": "ex",
        "fields": [{"name": "next", "type": ["null", "Node"]}],
    }
    with pytest.raises(avro.AvroSchemaError, match="recursive"):
        avro.parse_schema(rec)
