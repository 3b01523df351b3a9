"""JSON Schema transformer tests mirroring the reference matrix
(JsonSchemaTest.java:103-181: simple, complex w/ oneOf unions, $ref structs,
enum, array, map, recursion rejection, collision-safe field names)."""

import pytest
from pyspark.sql import types as ST

from kwack_spark.schema import jsonschema as js

SIMPLE = {
    "type": "object",
    "properties": {
        "f1": {"type": "integer"},
        "f2": {"type": "string"},
        "f3": {"type": "number"},
        "f4": {"type": "boolean"},
    },
    "required": ["f1", "f2"],
}

COMPLEX = {
    "type": "object",
    "$defs": {
        "addr": {
            "type": "object",
            "properties": {"street": {"type": "string"}, "zip": {"type": "integer"}},
            "required": ["street"],
        }
    },
    "properties": {
        "name": {"type": "string"},
        "tags": {"type": "array", "items": {"type": "string"}},
        "attrs": {"type": "object", "additionalProperties": {"type": "string"}},
        "color": {"enum": ["red", "green", "blue"]},
        "home": {"$ref": "#/$defs/addr"},
        "work": {"$ref": "#/$defs/addr"},
        "opt": {"oneOf": [{"type": "null"}, {"type": "string"}]},
        "iors": {"oneOf": [{"type": "integer"}, {"type": "string"}]},
    },
    "required": ["name"],
}


def test_simple_struct():
    st = js.to_struct_type(SIMPLE)
    assert st["f1"].dataType == ST.LongType() and not st["f1"].nullable
    assert st["f2"].dataType == ST.StringType() and not st["f2"].nullable
    assert st["f3"].dataType == ST.DoubleType() and st["f3"].nullable
    assert st["f4"].dataType == ST.BooleanType()


def test_complex_struct():
    st = js.to_struct_type(COMPLEX)
    assert st["tags"].dataType == ST.ArrayType(ST.StringType())
    assert st["attrs"].dataType == ST.MapType(ST.StringType(), ST.StringType())
    assert st["color"].dataType == ST.StringType()
    home = st["home"].dataType
    assert isinstance(home, ST.StructType) and home["zip"].dataType == ST.LongType()
    assert st["opt"].dataType == ST.StringType() and st["opt"].nullable
    iors = st["iors"].dataType
    assert isinstance(iors, ST.StructType)
    assert [f.name for f in iors.fields] == ["u0", "u1"]


def test_convert_and_oneof_resolution():
    st, convert = js.make_row_converter(COMPLEX)
    row = convert(
        '{"name":"n1","tags":["a","b"],"attrs":{"k":"v"},"color":"red",'
        '"home":{"street":"s1","zip":7},"opt":"x","iors":"strval"}'
    )
    named = dict(zip([f.name for f in st.fields], row))
    assert named["name"] == "n1" and named["tags"] == ["a", "b"]
    assert named["attrs"] == {"k": "v"} and named["color"] == "red"
    assert named["home"] == ("s1", 7)
    assert named["work"] is None
    assert named["opt"] == "x"
    assert named["iors"] == (None, "strval")  # validated into branch u1
    row2 = convert('{"name":"n2","iors":42}')
    named2 = dict(zip([f.name for f in st.fields], row2))
    assert named2["iors"] == (42, None)  # branch u0


def test_all_of_merge():
    sch = {
        "allOf": [
            {"type": "object", "properties": {"a": {"type": "integer"}}, "required": ["a"]},
            {"type": "object", "properties": {"b": {"type": "string"}}},
        ]
    }
    st = js.to_struct_type(sch)
    assert [f.name for f in st.fields] == ["a", "b"]
    assert not st["a"].nullable and st["b"].nullable
    _, convert = js.make_row_converter(sch)
    assert convert('{"a": 1, "b": "x"}') == (1, "x")


def test_recursion_rejected():
    sch = {
        "type": "object",
        "$defs": {
            "node": {
                "type": "object",
                "properties": {"next": {"$ref": "#/$defs/node"}},
            }
        },
        "properties": {"root": {"$ref": "#/$defs/node"}},
    }
    with pytest.raises(js.JsonSchemaError, match="recursive"):
        js.parse_schema(sch)


def test_type_array_nullable():
    sch = {
        "type": "object",
        "properties": {"v": {"type": ["null", "integer"]}},
        "required": ["v"],
    }
    st = js.to_struct_type(sch)
    assert st["v"].dataType == ST.LongType() and st["v"].nullable
    _, convert = js.make_row_converter(sch)
    assert convert('{"v": null}') == (None,)
    assert convert('{"v": 3}') == (3,)


def test_non_object_schema_rowval():
    st = js.to_struct_type({"type": "array", "items": {"type": "integer"}})
    assert [f.name for f in st.fields] == ["rowval"]
    _, convert = js.make_row_converter({"type": "array", "items": {"type": "integer"}})
    assert convert("[1,2,3]") == ([1, 2, 3],)


def test_collision_safe_names():
    """Reserved-word field names pass through unquoted into StructType
    (JsonSchemaTest.java:164-181 'group'/'order' safety)."""
    sch = {
        "type": "object",
        "properties": {"group": {"type": "string"}, "order": {"type": "integer"}},
    }
    st = js.to_struct_type(sch)
    assert [f.name for f in st.fields] == ["group", "order"]


def test_external_refs_resolve():
    """Confluent JSON Schema references: an external $ref resolves through
    the provided name->document store (transitively; intra-document refs
    inside a referenced document resolve against THAT document)."""
    import pytest

    addr = {
        "type": "object",
        "properties": {
            "city": {"$ref": "#/$defs/town"},
        },
        "$defs": {"town": {"type": "string"}},
    }
    cust = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "addr": {"$ref": "addr.json"},
        },
    }
    st = js.to_struct_type(cust, refs={"addr.json": addr})
    assert [f.name for f in st.fields] == ["name", "addr"]
    assert st["addr"].dataType["city"].dataType.simpleString() == "string"

    _, convert = js.make_row_converter(cust, refs={"addr.json": addr})
    assert convert('{"name":"a","addr":{"city":"x"}}') == ("a", ("x",))

    # unresolved external ref -> clear error naming what IS available
    with pytest.raises(js.JsonSchemaError, match="addr.json"):
        js.to_struct_type(cust, refs={"other.json": {}})
