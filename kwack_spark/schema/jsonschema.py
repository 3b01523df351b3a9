"""JSON Schema -> Spark StructType + record converter.

Capability parity with the reference's JsonTransformer
(/root/reference/src/main/java/io/kcache/kwack/transformer/json/
JsonTransformer.java:46-365), re-expressed for Spark:

- object -> StructType with required-ness driving nullability; plain
  ``additionalProperties`` objects (no fixed properties) -> MapType
  (JsonTransformer.java:102-115).
- array -> ArrayType, enum/const -> StringType, integer -> LongType,
  number -> DoubleType, string -> StringType, boolean -> BooleanType.
- ``allOf`` merges subschema properties into one struct
  (JsonTransformer.java:129-204).
- ``oneOf``/``anyOf``: [null, T] flattens to nullable T
  (JsonTransformer.java:74-81, 236-256); multi-branch becomes the
  struct-of-branches union encoding (u0, u1, ...) and the branch is resolved
  PER RECORD by validating the instance against each subschema in order
  (JsonTransformer.java:296-315) — done here with a small built-in validator
  (type / required / properties / enum / const), no external library.
- ``$ref`` within the document ($defs / definitions) is inlined; recursive
  refs are rejected (JsonSchemaTest.java:154-162).

Decode is ``json.loads`` + this converter (the wire payload for JSON Schema
serdes is plain JSON after the Confluent preamble).
"""

from __future__ import annotations

import json
from typing import Any, Callable

from pyspark.sql import types as ST


class JsonSchemaError(ValueError):
    pass


def parse_schema(schema: str | dict, refs: dict | None = None) -> dict:
    """``refs``: {ref name -> schema str|dict} for EXTERNAL ``$ref``s — the
    Confluent schema-references mechanism for JSON Schema, where a
    registered schema's references map $ref names (e.g. "customer.json")
    to registry subjects (resolved transitively by
    schema/registry.py:resolve_references, as the reference's deserializer
    does via its registry client, KwackEngine.java:194-203)."""
    root = json.loads(schema) if isinstance(schema, str) else schema
    return _inline_refs(root, root, (), refs or {})


def _deref_path(root: dict, ref: str, refs: dict) -> tuple[Any, dict]:
    """-> (target node, the document that target lives in)."""
    if not ref.startswith("#"):
        name = ref.split("#", 1)[0]
        if name not in refs:
            raise JsonSchemaError(
                f"external $ref {ref!r} not among resolved references "
                f"{sorted(refs)}"
            )
        doc = refs[name]
        doc = json.loads(doc) if isinstance(doc, str) else doc
        frag = ref[len(name):]
        if frag.startswith("#/"):  # e.g. other.json#/$defs/X
            return _deref_path(doc, frag, refs)[0], doc
        return doc, doc
    if not ref.startswith("#/"):
        raise JsonSchemaError(f"unsupported $ref form: {ref}")
    node: Any = root
    for part in ref[2:].split("/"):
        node = node[part.replace("~1", "/").replace("~0", "~")]
    return node, root


def _inline_refs(node: Any, root: dict, visiting: tuple, refs: dict) -> Any:
    if isinstance(node, list):
        return [_inline_refs(v, root, visiting, refs) for v in node]
    if not isinstance(node, dict):
        return node
    if "$ref" in node:
        ref = node["$ref"]
        if ref in visiting:
            raise JsonSchemaError(f"recursive schema reference: {ref}")
        target, doc = _deref_path(root, ref, refs)
        # external targets resolve their own intra-document refs against
        # THEIR document, not the referencing one
        return _inline_refs(target, doc, visiting + (ref,), refs)
    return {k: _inline_refs(v, root, visiting, refs) for k, v in node.items()}


# ---------------------------------------------------------------------------
# schema -> Spark type
# ---------------------------------------------------------------------------


def _is_null_schema(s: Any) -> bool:
    return isinstance(s, dict) and s.get("type") == "null"


def _branches(node: dict) -> list | None:
    for key in ("oneOf", "anyOf"):
        if key in node:
            return node[key]
    # JSON Schema type arrays: {"type": ["null", "string"]} behave as a union
    t = node.get("type")
    if isinstance(t, list):
        return [{**node, "type": x} for x in t]
    return None


def nullable_unwrap(node: dict) -> tuple[dict, bool]:
    branches = _branches(node)
    if branches is not None:
        non_null = [b for b in branches if not _is_null_schema(b)]
        has_null = len(non_null) != len(branches)
        if len(non_null) == 1:
            return non_null[0], has_null
        return {"__union__": non_null}, has_null
    return node, False


def _merge_all_of(node: dict) -> dict:
    """allOf: merge subschema properties/required into one object schema
    (JsonTransformer.java:129-204)."""
    merged_props: dict = {}
    merged_required: set = set()
    out = {k: v for k, v in node.items() if k != "allOf"}
    for sub in node["allOf"]:
        if "allOf" in sub:
            sub = _merge_all_of(sub)
        merged_props.update(sub.get("properties", {}))
        merged_required.update(sub.get("required", []))
        if "type" in sub and "type" not in out:
            out["type"] = sub["type"]
    merged_props.update(out.get("properties", {}))
    merged_required.update(out.get("required", []))
    out["properties"] = merged_props
    out["required"] = sorted(merged_required)
    out.setdefault("type", "object")
    return out


def to_spark_type(node: dict) -> ST.DataType:
    node, _ = nullable_unwrap(node)
    if "__union__" in node:
        return ST.StructType(
            [
                ST.StructField(f"u{i}", to_spark_type(b), nullable=True)
                for i, b in enumerate(node["__union__"])
            ]
        )
    if "allOf" in node:
        node = _merge_all_of(node)
    if "enum" in node or "const" in node:
        return ST.StringType()
    t = node.get("type")
    if t == "object" or ("properties" in node and t is None):
        props = node.get("properties", {})
        if not props:
            ap = node.get("additionalProperties")
            if isinstance(ap, dict):
                return ST.MapType(ST.StringType(), to_spark_type(ap))
            return ST.MapType(ST.StringType(), ST.StringType())
        required = set(node.get("required", []))
        return ST.StructType(
            [
                ST.StructField(
                    name,
                    to_spark_type(sub),
                    nullable=name not in required or _nullable(sub),
                )
                for name, sub in props.items()
            ]
        )
    if t == "array":
        items = node.get("items", {})
        return ST.ArrayType(to_spark_type(items) if items else ST.StringType())
    if t == "string":
        return ST.StringType()
    if t == "integer":
        return ST.LongType()
    if t == "number":
        return ST.DoubleType()
    if t == "boolean":
        return ST.BooleanType()
    if t == "null":
        return ST.StringType()
    raise JsonSchemaError(f"unsupported json-schema node: {node}")


def _nullable(node: dict) -> bool:
    _, n = nullable_unwrap(node)
    return n


def to_struct_type(schema: str | dict, refs: dict | None = None) -> ST.StructType:
    """Top-level object schema flattens into table columns; anything else is
    a single ``rowval`` column (KwackEngine.java:607-620 layout)."""
    node = parse_schema(schema, refs)
    base, _ = nullable_unwrap(node)
    if "allOf" in base:
        base = _merge_all_of(base)
    if "__union__" not in base and (
        base.get("type") == "object" and base.get("properties")
    ):
        return to_spark_type(base)  # type: ignore[return-value]
    return ST.StructType([ST.StructField("rowval", to_spark_type(node), True)])


# ---------------------------------------------------------------------------
# minimal instance validation (for oneOf branch resolution)
# ---------------------------------------------------------------------------


def validates(instance: Any, schema: dict) -> bool:
    """True iff instance satisfies schema — the subset needed to pick
    oneOf/anyOf branches per record (JsonTransformer.java:296-315)."""
    if "__union__" in schema:
        return any(validates(instance, b) for b in schema["__union__"])
    if "allOf" in schema:
        schema = _merge_all_of(schema)
    branches = _branches(schema)
    if branches is not None:
        return any(validates(instance, b) for b in branches)
    if "const" in schema:
        return instance == schema["const"]
    if "enum" in schema:
        return instance in schema["enum"]
    t = schema.get("type")
    if t == "null":
        return instance is None
    if t == "boolean":
        return isinstance(instance, bool)
    if t == "integer":
        return isinstance(instance, int) and not isinstance(instance, bool)
    if t == "number":
        return isinstance(instance, (int, float)) and not isinstance(instance, bool)
    if t == "string":
        return isinstance(instance, str)
    if t == "array":
        if not isinstance(instance, list):
            return False
        items = schema.get("items")
        return all(validates(v, items) for v in instance) if items else True
    if t == "object" or "properties" in schema:
        if not isinstance(instance, dict):
            return False
        for req in schema.get("required", []):
            if req not in instance:
                return False
        props = schema.get("properties", {})
        return all(
            validates(v, props[k]) for k, v in instance.items() if k in props
        )
    return True  # permissive for untyped schemas


# ---------------------------------------------------------------------------
# instance -> Spark row value
# ---------------------------------------------------------------------------


def _coerce(value: Any, node: dict) -> Any:
    if value is None:
        return None
    node, _ = nullable_unwrap(node)
    if "__union__" in node:
        branches = node["__union__"]
        out = [None] * len(branches)
        for i, b in enumerate(branches):
            if validates(value, b):
                out[i] = _coerce(value, b)
                break
        else:
            raise JsonSchemaError(f"value matches no union branch: {value!r}")
        return tuple(out)
    if "allOf" in node:
        node = _merge_all_of(node)
    if "enum" in node or "const" in node:
        return str(value)
    t = node.get("type")
    if t == "object" or ("properties" in node and t is None):
        props = node.get("properties", {})
        if not props:
            ap = node.get("additionalProperties")
            vt = ap if isinstance(ap, dict) else {"type": "string"}
            return {k: _coerce(v, vt) for k, v in value.items()}
        return tuple(_coerce(value.get(name), sub) for name, sub in props.items())
    if t == "array":
        items = node.get("items", {"type": "string"})
        return [_coerce(v, items) for v in value]
    if t == "number":
        return float(value)
    if t == "integer":
        return int(value)
    return value


def make_row_converter(
    schema: str | dict, refs: dict | None = None
) -> tuple[ST.StructType, Callable[[bytes | str], tuple]]:
    """Returns (StructType, fn(json payload) -> row tuple).  ``refs``:
    external $ref documents (see parse_schema)."""
    node = parse_schema(schema, refs)
    st = to_struct_type(schema, refs)
    base, _ = nullable_unwrap(node)
    if "allOf" in base:
        base = _merge_all_of(base)
    flat = "__union__" not in base and base.get("type") == "object" and base.get("properties")

    def convert(payload: bytes | str) -> tuple:
        obj = json.loads(payload)
        if flat:
            return _coerce(obj, base)
        return (_coerce(obj, node),)

    return st, convert
