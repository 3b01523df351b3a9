"""Kafka source: topic -> decoded, flattened, metadata-enriched DataFrame.

Re-expresses the reference's ingest core (KwackEngine.java:745-774 consume,
:440-477 wire-format handling, :516-585 serde dispatch, :696-743 rowinfo,
:820-823 tombstone skip, :607-620 flattening) on the Spark Kafka batch/
streaming source.

Design for testability and scale:
- ``decode_topic`` operates on any DataFrame with the Kafka source's column
  shape (key/value binary + topic/partition/offset/timestamp/timestampType/
  headers) — the connector-produced frame and the test-synthesized frame are
  the same thing, so the whole decode path is exercised without a broker.
- Wire format: Confluent framing is magic byte 0x00 + 4-byte big-endian
  schema id (KwackEngine.java:1037-1045); stripping and id extraction happen
  JVM-side (substring / conv) so the scan stays in whole-stage codegen.
  ``skip.bytes`` trims a fixed prefix first (KwackConfig.java:96-98).
- Schema-driven decode (Avro/JSON-Schema/Proto) runs in ONE Arrow-batched
  mapInPandas stage; the registry snapshot is broadcast so per-record writer
  schema resolution (Avro evolution) is a dict lookup on the executor.
- Primitive serdes decode JVM-side (cast / conv) — no Python in the path.
- At 100 TB the Kafka read parallelizes per topic-partition (1 task each,
  ``minPartitions`` to split further); decode is narrow (no shuffle).
"""

from __future__ import annotations

import struct
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as ST

from kwack_spark.config import Serde
from kwack_spark.schema import avro as avro_schema
from kwack_spark.schema import jsonschema as json_schema
from kwack_spark.schema import protobuf as proto_schema
from kwack_spark.schema.registry import MockSchemaRegistry

MAGIC_BYTE = 0

# the Spark Kafka source's column shape (includeHeaders=true)
KAFKA_FRAME_SCHEMA = ST.StructType(
    [
        ST.StructField("key", ST.BinaryType(), True),
        ST.StructField("value", ST.BinaryType(), True),
        ST.StructField("topic", ST.StringType(), False),
        ST.StructField("partition", ST.IntegerType(), False),
        ST.StructField("offset", ST.LongType(), False),
        ST.StructField("timestamp", ST.TimestampType(), False),
        ST.StructField("timestampType", ST.IntegerType(), False),
        ST.StructField(
            "headers",
            ST.ArrayType(
                ST.StructType(
                    [
                        ST.StructField("key", ST.StringType(), False),
                        ST.StructField("value", ST.BinaryType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)


# ---------------------------------------------------------------------------
# wire format (Confluent framing)
# ---------------------------------------------------------------------------


def confluent_frame(payload: bytes, schema_id: int) -> bytes:
    """payload -> 0x00 + 4-byte BE schema id + payload (the synthetic
    re-framing the reference applies to external-schema payloads,
    KwackEngine.java:454-477)."""
    return bytes([MAGIC_BYTE]) + schema_id.to_bytes(4, "big") + payload


def split_frame(data: bytes) -> tuple[int | None, bytes]:
    """bytes -> (schema_id | None, payload) — Python-side mirror of
    schemaIdFor (KwackEngine.java:1037-1045)."""
    if len(data) >= 5 and data[0] == MAGIC_BYTE:
        return int.from_bytes(data[1:5], "big"), data[5:]
    return None, data


def schema_id_col(col: Column) -> Column:
    """JVM-side schema-id extraction: NULL unless Confluent-framed."""
    framed = (F.length(col) >= 5) & (F.substring(col, 1, 1) == F.lit(bytes([0])))
    sid = F.conv(F.hex(F.substring(col, 2, 4)), 16, 10).cast("int")
    return F.when(framed, sid)


def payload_col(name: str, skip_bytes: int = 0) -> Column:
    """JVM-side preamble strip (+ optional fixed skip.bytes prefix); takes a
    column NAME so the expression stays a plain SQL substring (codegen'd)."""
    base = f"substring({name}, {skip_bytes + 1})" if skip_bytes else name
    c = F.expr(base)
    framed = (F.length(c) >= 5) & (F.substring(c, 1, 1) == F.lit(bytes([0])))
    return F.when(framed, F.expr(f"substring({base}, 6)")).otherwise(c)


# ---------------------------------------------------------------------------
# primitive serdes (Kafka primitive deserializer formats, JVM-side)
# ---------------------------------------------------------------------------


def _signed(col: Column, bits: int) -> Column:
    v = F.conv(F.hex(col), 16, 10).cast("decimal(21,0)")
    # string literals: 2^64 overflows a java long in F.lit
    wrap = F.lit(str(2 ** bits)).cast("decimal(21,0)")
    half = F.lit(str(2 ** (bits - 1) - 1)).cast("decimal(21,0)")
    return F.when(v > half, v - wrap).otherwise(v)


def primitive_value_col(col: Column, kind: str) -> Column:
    """Kafka primitive deserializers: big-endian fixed width / UTF-8."""
    if kind == "string":
        return col.cast("string")
    if kind == "binary":
        return col
    if kind == "short":
        return _signed(col, 16).cast("short")
    if kind == "int":
        return _signed(col, 32).cast("int")
    if kind == "long":
        return _signed(col, 64).cast("long")
    raise ValueError(f"primitive decoded in python path: {kind}")


def _decode_primitive_py(data: bytes, kind: str) -> Any:
    if data is None:
        return None
    if kind == "float":
        return struct.unpack(">f", data)[0]
    if kind == "double":
        return struct.unpack(">d", data)[0]
    if kind == "short":
        return struct.unpack(">h", data)[0]
    if kind == "int":
        return struct.unpack(">i", data)[0]
    if kind == "long":
        return struct.unpack(">q", data)[0]
    if kind == "string":
        return data.decode("utf-8")
    if kind == "binary":
        return bytes(data)
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# serde -> (StructType, converter)
# ---------------------------------------------------------------------------


def _dictify(value: Any, dt: ST.DataType) -> Any:
    """Converter output (tuples for records) -> Arrow-friendly values
    (dicts for structs), recursively."""
    if value is None:
        return None
    if isinstance(dt, ST.StructType):
        return {
            f.name: _dictify(v, f.dataType) for f, v in zip(dt.fields, value)
        }
    if isinstance(dt, ST.ArrayType):
        return [_dictify(v, dt.elementType) for v in value]
    if isinstance(dt, ST.MapType):
        return {k: _dictify(v, dt.valueType) for k, v in value.items()}
    return value


def resolve_serde(
    serde: Serde,
    topic: str,
    is_key: bool,
    registry: MockSchemaRegistry | None,
) -> tuple[ST.StructType, Callable[[bytes, dict], tuple] | None, Serde]:
    """Serde -> (StructType, python converter | None if JVM-side).

    ``latest``/``<id>`` resolve against the registry ONCE at init
    (KwackEngine.java:343-349, 422-430) and rewrite to the concrete schema
    serde.  The returned converter takes (payload bytes, writer_schemas
    snapshot dict) and returns a row tuple.
    """
    if serde.kind in ("latest", "id"):
        if registry is None:
            raise ValueError(f"serde {serde.kind!r} needs a schema registry")
        rs = (
            registry.latest(f"{topic}-{'key' if is_key else 'value'}")
            if serde.kind == "latest"
            else registry.by_id(serde.schema_id)
        )
        kind = {"AVRO": "avro", "JSON": "jsonschema", "PROTOBUF": "proto"}[rs.schema_type]
        # resolve Confluent schema references transitively, driver-side,
        # ONCE (KwackEngine.java:194-203's registry client does the same):
        # the (name, schema_str) prelude rides the Serde into the parsers
        from kwack_spark.schema.registry import resolve_references

        serde = Serde(
            kind=kind,
            schema_str=rs.schema_str,
            refs=resolve_references(registry, rs),
        )

    if serde.kind == "avro":
        prelude = tuple(s for _, s in serde.refs)
        st, convert = avro_schema.make_row_converter(serde.schema_str, prelude)
        reader = avro_schema.parse_schema(serde.schema_str, prelude)
        # per-id memo: writer schema parse + same-as-reader comparison happen
        # ONCE per schema id per task, never per record (hot-path contract)
        writer_memo: dict[int, dict | None] = {}

        def conv_avro(payload: bytes, writers: dict) -> tuple:
            sid, body = split_frame(payload)
            writer = None
            if sid is not None and sid in writers:
                if sid not in writer_memo:
                    w = writers[sid]
                    w_pre = tuple(s for _, s in w[2]) if len(w) > 2 else ()
                    parsed = avro_schema.parse_schema(w[1], w_pre)
                    writer_memo[sid] = parsed if parsed != reader else None
                writer = writer_memo[sid]
            return convert(body, writer)

        return st, conv_avro, serde
    if serde.kind == "jsonschema":
        # refs: $ref name -> schema document (Confluent JSON Schema references)
        st, convert = json_schema.make_row_converter(
            serde.schema_str, dict(serde.refs) or None
        )
        tag = serde.tag

        def conv_json(payload: bytes, writers: dict, key: bytes | None = None) -> tuple:
            import json as _json

            _, body = split_frame(payload)
            if tag and key is not None:
                # ;tag:src->dst — copy field src from the key object into
                # field dst of the value object (KwackEngine.java:491-499)
                _, kbody = split_frame(key)
                try:
                    kobj = _json.loads(kbody)
                    vobj = _json.loads(body)
                    if isinstance(kobj, dict) and isinstance(vobj, dict) and tag[0] in kobj:
                        vobj[tag[1]] = kobj[tag[0]]
                        body = _json.dumps(vobj).encode("utf-8")
                except (ValueError, UnicodeDecodeError):
                    pass
            return convert(body)

        return st, conv_json, serde
    if serde.kind == "proto":
        # refs: import path -> .proto source (Confluent proto references)
        imports = {name: src for name, src in serde.refs} or None
        st, convert = proto_schema.make_row_converter(
            serde.schema_str, serde.message, imports
        )
        proto_root = proto_schema.parse_proto(serde.schema_str, imports)
        expected_msg = serde.message or next(iter(proto_root["messages"]))
        expected_idx = proto_schema.indexes_for_message(proto_root, expected_msg)

        def conv_proto(payload: bytes, writers: dict) -> tuple:
            sid, body = split_frame(payload)
            if sid is None:
                # bare protobuf (no Confluent header -> no index prefix)
                return convert(body)
            # Confluent framing: varint message-index list after the header
            # selects the message within the writer's .proto file
            # (MessageIndexes; KwackEngine.java:460-477).  Validate it against
            # the reader's ;msg: / first-message descriptor — a mismatched
            # record would mis-decode silently otherwise.
            indexes, rest = proto_schema.read_message_indexes(body)
            if indexes != expected_idx:
                got = proto_schema.message_for_indexes(proto_root, indexes)
                raise ValueError(
                    f"protobuf message-index mismatch: wire selects {got!r} "
                    f"{indexes}, reader configured for {expected_msg!r} "
                    f"{expected_idx} — use ;msg:{got} in the serde"
                )
            return convert(rest)

        return st, conv_proto, serde
    if serde.kind == "rawjson":
        # schema-less JSON: single JSON-string rowval column, no flattening
        # (KwackEngine.java:672-673)
        return (
            ST.StructType([ST.StructField("rowval", ST.StringType(), True)]),
            None,
            serde,
        )
    if serde.kind in ("float", "double"):
        dt = ST.FloatType() if serde.kind == "float" else ST.DoubleType()
        kind = serde.kind

        def conv_prim(payload: bytes, writers: dict) -> tuple:
            return (_decode_primitive_py(payload, kind),)

        return ST.StructType([ST.StructField("rowval", dt, True)]), conv_prim, serde
    # JVM-side primitives
    dt = {
        "short": ST.ShortType(),
        "int": ST.IntegerType(),
        "long": ST.LongType(),
        "string": ST.StringType(),
        "binary": ST.BinaryType(),
    }[serde.kind]
    return ST.StructType([ST.StructField("rowval", dt, True)]), None, serde


# ---------------------------------------------------------------------------
# rowinfo
# ---------------------------------------------------------------------------

_ROWINFO_BUILDERS = {
    # ksi/vsi: from the raw frame in the JVM path; the Python decode stage
    # emits them as plain int columns instead (key/value don't survive it)
    "ksi": lambda: schema_id_col(F.col("key")).alias("ksi"),
    "vsi": lambda: schema_id_col(F.col("value")).alias("vsi"),
    "top": lambda: F.col("topic").alias("top"),
    "par": lambda: F.col("partition").alias("par"),
    "off": lambda: F.col("offset").alias("off"),
    "ts": lambda: (F.unix_micros(F.col("timestamp")) / 1000).cast("long").alias("ts"),
    "tst": lambda: F.col("timestampType").cast("short").alias("tst"),
    "hdr": lambda: F.when(
        F.col("headers").isNotNull(),
        F.map_from_entries(
            F.transform(
                F.col("headers"),
                lambda h: F.struct(
                    h["key"].alias("key"), h["value"].cast("string").alias("value")
                ),
            )
        ),
    ).alias("hdr"),
}


def rowinfo_col(row_attributes: tuple[str, ...], ids_precomputed: bool = False) -> Column:
    """The rowinfo metadata struct (KwackEngine.java:696-743), holding the
    enabled attributes.  Header maps keep the LAST value per key
    (KwackEngine.java:1022-1035) — requires mapKeyDedupPolicy=LAST_WIN, set
    by decode_topic.  ``ids_precomputed``: ksi/vsi already exist as int
    columns (Python decode path) instead of being parsed from key/value.

    Permanent delta vs the reference: ``epo`` (leader epoch,
    KwackEngine.java:713) is NOT supported — Spark's Kafka source does not
    expose the leader epoch, so requesting it is skipped rather than
    emitting an always-NULL column that looks like data.  Any other unknown
    attribute raises."""
    parts = []
    for a in row_attributes:
        if a == "epo":
            continue  # documented permanent delta — see docstring
        if a not in _ROWINFO_BUILDERS:
            raise ValueError(f"unknown rowinfo attribute: {a!r}")
        if ids_precomputed and a in ("ksi", "vsi"):
            parts.append(F.col(a).alias(a))
        else:
            parts.append(_ROWINFO_BUILDERS[a]())
    return F.struct(*parts).alias("rowinfo")


# ---------------------------------------------------------------------------
# the decode pipeline
# ---------------------------------------------------------------------------


def decode_topic(
    df: DataFrame,
    topic: str,
    value_serde: Serde,
    key_serde: Serde | None = None,
    registry: MockSchemaRegistry | None = None,
    row_attributes: tuple[str, ...] = ("rowkey", "ksi", "vsi", "par", "off", "ts", "hdr"),
    skip_bytes: int = 0,
    on_error: str = "fail",
) -> DataFrame:
    """Kafka-shaped frame DataFrame -> decoded table for ``topic``.

    Layout mirrors the reference (KwackEngine.java:593-648): [rowkey,]
    <flattened value columns | rowval>, rowinfo.  Struct-valued tables skip
    tombstones (null value -> no row, KwackEngine.java:820-823).

    ``on_error``: 'fail' raises on an undecodable record (default, matches
    the reference); 'skip' drops the record; 'tag' QUARANTINES it in place —
    the row is kept with its decodable parts (rowkey if the key decodes,
    frame metadata always) plus a ``corrupt`` boolean column, the
    PERMISSIVE-with-corrupt-record-column convention.  At 100 TB one poison
    record must not kill the ingest job — run production loads with 'skip'
    (and reconcile counts against end offsets) or 'tag' (and route
    ``WHERE corrupt`` to a dead-letter table: offsets + keys survive, so
    the bad producers are identifiable without re-reading the topic).
    'tag' always decodes on the Python stage (both JVM fast paths are
    fail-mode-only, and JVM primitive casts yield NULLs instead of errors,
    which could not be told apart from legitimate NULLs).
    """
    if on_error not in ("fail", "skip", "tag"):
        raise ValueError(
            f"on_error must be 'fail', 'skip' or 'tag', got {on_error!r}"
        )
    spark = df.sparkSession
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    key_serde = key_serde or Serde(kind="binary")

    v_st, v_conv, value_serde = resolve_serde(value_serde, topic, False, registry)
    k_st, k_conv, key_serde = resolve_serde(key_serde, topic, True, registry)

    value_is_struct = v_conv is not None and value_serde.kind in (
        "avro",
        "jsonschema",
        "proto",
    ) and len(v_st.fields) > 0 and v_st.fieldNames() != ["rowval"]
    if value_is_struct:
        # tombstone skip for struct tables
        df = df.filter(F.col("value").isNotNull())

    want_rowkey = "rowkey" in row_attributes
    info_attrs = tuple(a for a in row_attributes if a != "rowkey")

    # --- JVM-side fast path ---------------------------------------------------
    if v_conv is None and k_conv is None and on_error != "tag":
        meta_cols = [rowinfo_col(info_attrs)] if info_attrs else []
        cols: list[Column] = []
        if want_rowkey:
            cols.append(_jvm_key_col(key_serde, skip_bytes))
        cols.append(_jvm_value_col(value_serde, skip_bytes))
        return df.select(*cols, *meta_cols)

    # --- JVM from_avro fast path (evolution-free topics) ----------------------
    # Whole-stage-codegen decode when (a) the spark-avro module is present,
    # (b) no writer evolution is possible for this subject, and (c) the
    # schema maps identically under both type matrices — see
    # sources/avro_jvm.py for the gates.  Identical results to the Python
    # stage, ~Java-cost per record instead of ~10x (the reference's decode
    # is Java, KwackEngine.java:516-585); at 100 TB ingest this is the
    # difference that matters.
    key_jvm_ok = (not want_rowkey) or (
        k_conv is None and key_serde.kind in ("short", "int", "long", "string", "binary")
    )
    # fail-mode only: from_avro's PERMISSIVE mode maps a corrupt record to
    # an all-null-FIELDS struct (not a NULL struct), which is
    # indistinguishable from a legitimate all-null record — so 'skip'
    # cannot drop poison here and keeps the Python path; FAILFAST raises
    # exactly like the Python decoder's fail mode does.
    if (
        value_is_struct
        and value_serde.kind == "avro"
        and key_jvm_ok
        and on_error == "fail"
    ):
        from kwack_spark.sources import avro_jvm

        ok, _why = avro_jvm.eligible(value_serde, topic, registry)
        if ok and avro_jvm.available(spark):
            head = [_jvm_key_col(key_serde, skip_bytes)] if want_rowkey else []
            meta = [rowinfo_col(info_attrs)] if info_attrs else []
            dec = avro_jvm.decode_value_col(
                payload_col("value", skip_bytes), value_serde.schema_str, on_error
            )
            out = df.select(*head, dec.alias("_v"), *meta)
            order = (["rowkey"] if want_rowkey else []) + [
                F.col(f"_v.{f.name}").alias(f.name) for f in v_st.fields
            ] + (["rowinfo"] if info_attrs else [])
            return out.select(*order)

    # --- JVM from_protobuf fast path (single-message, local-type schemas) -----
    # Mirrors the from_avro gate: jar availability (spark-protobuf — absent
    # in this sandbox, so this branch can never activate here), exactly one
    # top-level message (fixed 0x00 message-index prefix, stripped JVM-side
    # with a raising guard), type-matrix compatibility, and no writer
    # evolution — see sources/protobuf_jvm.py.
    if (
        value_is_struct
        and value_serde.kind == "proto"
        and key_jvm_ok
        and on_error == "fail"
    ):
        from kwack_spark.sources import protobuf_jvm

        ok, _why = protobuf_jvm.eligible(value_serde, topic, registry)
        if ok and protobuf_jvm.available(spark):
            head = [_jvm_key_col(key_serde, skip_bytes)] if want_rowkey else []
            meta = [rowinfo_col(info_attrs)] if info_attrs else []
            dec = protobuf_jvm.decode_value_col(
                payload_col("value", skip_bytes), value_serde.schema_str, on_error
            )
            out = df.select(*head, dec.alias("_v"), *meta)
            order = (["rowkey"] if want_rowkey else []) + [
                F.col(f"_v.{f.name}").alias(f.name) for f in v_st.fields
            ] + (["rowinfo"] if info_attrs else [])
            return out.select(*order)

    # --- JVM from_json fast path (plain-struct JSON-Schema topics) ------------
    # Same shape as the from_avro path but jar-free: from_json is core
    # Spark, so this is the JVM decode path that can execute anywhere.
    # Gated on plain-struct schemas (no oneOf/anyOf, typed maps/arrays,
    # string enums), no ;tag:, fail mode — see sources/jsonschema_jvm.py.
    # No evolution gate: JSON decodes with the reader schema on BOTH paths.
    if (
        value_is_struct
        and value_serde.kind == "jsonschema"
        and key_jvm_ok
        and on_error == "fail"
    ):
        from kwack_spark.sources import jsonschema_jvm

        ok, _why = jsonschema_jvm.eligible(value_serde)
        if ok:
            head = [_jvm_key_col(key_serde, skip_bytes)] if want_rowkey else []
            meta = [rowinfo_col(info_attrs)] if info_attrs else []
            dec = jsonschema_jvm.decode_value_col(
                payload_col("value", skip_bytes),
                value_serde.schema_str,
                value_serde.refs,
                on_error,
            )
            out = df.select(*head, dec.alias("_v"), *meta)
            order = (["rowkey"] if want_rowkey else []) + [
                F.col(f"_v.{f.name}").alias(f.name) for f in v_st.fields
            ] + (["rowinfo"] if info_attrs else [])
            return out.select(*order)

    # --- Python decode stage (Arrow-batched) ---------------------------------
    writers_bc = spark.sparkContext.broadcast(registry.snapshot() if registry else {})

    out_fields: list[ST.StructField] = []
    if want_rowkey:
        if k_conv is None:
            key_dt: ST.DataType = k_st.fields[0].dataType
        else:
            key_dt = k_st if k_st.fieldNames() != ["rowval"] else k_st.fields[0].dataType
        out_fields.append(ST.StructField("rowkey", key_dt, True))
    if value_is_struct:
        out_fields.extend(v_st.fields)
    else:
        out_fields.append(
            ST.StructField(
                "rowval",
                v_st.fields[0].dataType if v_st.fieldNames() == ["rowval"] else v_st,
                True,
            )
        )
    if on_error == "tag":
        # quarantined rows null every data field, so schema-derived
        # non-nullability (e.g. required Avro fields) must relax — Arrow
        # rejects a null in a non-nullable vector
        out_fields = [
            ST.StructField(f.name, f.dataType, True) for f in out_fields
        ]
        out_fields.append(ST.StructField("corrupt", ST.BooleanType(), True))
    id_fields = [
        ST.StructField("ksi", ST.IntegerType(), True),
        ST.StructField("vsi", ST.IntegerType(), True),
    ]
    out_schema = ST.StructType(out_fields + id_fields + _frame_meta_fields())

    k_flat = k_conv is not None and k_st.fieldNames() != ["rowval"]

    def _decode_one(rec, value, writers, tag: bool = False) -> dict:
        out: dict[str, Any] = {}
        if tag:
            # quarantine mode: decode key and value independently so a
            # poison value keeps its (identifying) rowkey, and vice versa
            out.update({f.name: None for f in out_fields})
            out["corrupt"] = False
            if want_rowkey:
                try:
                    out["rowkey"] = _decode_key(
                        rec.key, k_conv, k_st, k_flat, writers, skip_bytes,
                        key_serde.kind,
                    )
                except Exception:
                    out["corrupt"] = True
            try:
                body = None if value is None else (
                    value[skip_bytes:] if skip_bytes else value
                )
                if value is None:
                    out["rowval"] = None  # non-struct tombstone (struct
                    # tables filtered nulls before this stage)
                elif v_conv is None:
                    if value_serde.kind == "rawjson":
                        out["rowval"] = split_frame(bytes(body))[1].decode("utf-8")
                    else:
                        out["rowval"] = _decode_primitive_py(
                            bytes(body), value_serde.kind
                        )
                else:
                    row = (
                        v_conv(body, writers, rec.key)
                        if value_serde.tag
                        else v_conv(body, writers)
                    )
                    if value_is_struct:
                        for f, v in zip(v_st.fields, row):
                            out[f.name] = _dictify(v, f.dataType)
                    else:
                        out["rowval"] = _dictify(row[0], v_st.fields[0].dataType)
            except Exception:
                for f in v_st.fields if value_is_struct else ():
                    out[f.name] = None
                out["corrupt"] = True
            out["ksi"] = None if rec.key is None else split_frame(bytes(rec.key))[0]
            out["vsi"] = None if value is None else split_frame(bytes(value))[0]
            for m in ("topic", "partition", "offset", "timestamp", "timestampType", "headers"):
                out[m] = getattr(rec, m)
            return out
        if want_rowkey:
            out["rowkey"] = _decode_key(
                rec.key, k_conv, k_st, k_flat, writers, skip_bytes, key_serde.kind
            )
        if v_conv is None:
            if value is None:
                out["rowval"] = None
            elif value_serde.kind == "rawjson":
                body = bytes(value[skip_bytes:] if skip_bytes else value)
                out["rowval"] = split_frame(body)[1].decode("utf-8")
            else:
                body = bytes(value[skip_bytes:] if skip_bytes else value)
                out["rowval"] = _decode_primitive_py(body, value_serde.kind)
        else:
            body = value[skip_bytes:] if skip_bytes else value
            if body is None:
                out["rowval"] = None
            else:
                if value_serde.tag:
                    row = v_conv(body, writers, rec.key)
                else:
                    row = v_conv(body, writers)
                if value_is_struct:
                    for f, v in zip(v_st.fields, row):
                        out[f.name] = _dictify(v, f.dataType)
                else:
                    out["rowval"] = _dictify(row[0], v_st.fields[0].dataType)
        out["ksi"] = None if rec.key is None else split_frame(bytes(rec.key))[0]
        out["vsi"] = None if value is None else split_frame(bytes(value))[0]
        for m in ("topic", "partition", "offset", "timestamp", "timestampType", "headers"):
            out[m] = getattr(rec, m)
        return out

    def decode_batches(batches):
        import pandas as pd

        writers = writers_bc.value
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                value = rec.value
                if value_is_struct and value is None:
                    continue
                if on_error == "skip":
                    try:
                        rows.append(_decode_one(rec, value, writers))
                    except Exception:
                        continue  # poison record: drop, keep the job alive
                elif on_error == "tag":
                    rows.append(_decode_one(rec, value, writers, tag=True))
                else:
                    rows.append(_decode_one(rec, value, writers))
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            ) if rows else pd.DataFrame(columns=[f.name for f in out_schema.fields])

    decoded = df.mapInPandas(decode_batches, out_schema)
    data_cols = [f.name for f in out_fields]
    meta_cols = [rowinfo_col(info_attrs, ids_precomputed=True)] if info_attrs else []
    return decoded.select(*data_cols, *meta_cols)


def _frame_meta_fields() -> list[ST.StructField]:
    return [f for f in KAFKA_FRAME_SCHEMA.fields if f.name not in ("key", "value")]


def _decode_key(key: Any, k_conv, k_st, k_flat: bool, writers: dict, skip_bytes: int, kind: str):
    if key is None:
        return None
    body = key[skip_bytes:] if skip_bytes else key
    if k_conv is None:  # primitive key decoded Python-side in the mixed path
        return _decode_primitive_py(bytes(body), kind)
    row = k_conv(body, writers)
    if k_flat:
        return _dictify(row, k_st)
    return _dictify(row[0], k_st.fields[0].dataType)


def _jvm_key_col(key_serde: Serde, skip_bytes: int) -> Column:
    c = F.col("key")
    if skip_bytes:
        c = F.expr(f"substring(key, {skip_bytes + 1})")
    return primitive_value_col(c, key_serde.kind).alias("rowkey")


def _jvm_value_col(value_serde: Serde, skip_bytes: int) -> Column:
    if value_serde.kind == "rawjson":
        return payload_col("value", skip_bytes).cast("string").alias("rowval")
    c = F.expr(f"substring(value, {skip_bytes + 1})") if skip_bytes else F.col("value")
    return primitive_value_col(c, value_serde.kind).alias("rowval")


# ---------------------------------------------------------------------------
# topic registration (the real Kafka connector path)
# ---------------------------------------------------------------------------


def resolve_relative_offsets(
    value: int, end_offsets: dict[int, int]
) -> dict[int, int]:
    """'-N' (N records before end, KwackMain.java:69-76) -> absolute
    per-partition starting offsets: max(0, end - N) each partition, so a
    partition shorter than N replays from its beginning."""
    n = -value
    return {p: max(0, end - n) for p, end in end_offsets.items()}


def jvm_end_offsets(
    spark: SparkSession, bootstrap: str, topic: str, partitions: list[int] | None = None
) -> dict[int, int]:
    """Per-partition END offsets via the Kafka AdminClient through Spark's
    JVM (py4j — no new Python dependency; the kafka-clients jar arrives with
    the same spark-sql-kafka connector package the source itself needs)."""
    try:
        jvm = spark._jvm
        props = jvm.java.util.Properties()
        props.put("bootstrap.servers", bootstrap)
        admin = jvm.org.apache.kafka.clients.admin.AdminClient.create(props)
        try:
            if partitions is None:
                names = jvm.java.util.Collections.singletonList(topic)
                desc = admin.describeTopics(names).allTopicNames().get().get(topic)
                partitions = [pi.partition() for pi in desc.partitions()]
            spec = jvm.org.apache.kafka.clients.admin.OffsetSpec.latest()
            req = jvm.java.util.HashMap()
            tps = {
                p: jvm.org.apache.kafka.common.TopicPartition(topic, p)
                for p in partitions
            }
            for tp in tps.values():
                req.put(tp, spec)
            res = admin.listOffsets(req).all().get()
            return {p: res.get(tp).offset() for p, tp in tps.items()}
        finally:
            admin.close()
    except Exception as exc:
        raise RuntimeError(
            "cannot resolve end offsets — the Kafka AdminClient needs the "
            "kafka-clients jar on the Spark classpath (spark.jars.packages="
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>); "
            "alternatively pass end_offsets_fn to read_topic_frames"
        ) from exc


def kafka_reader_options(
    bootstrap: str,
    topic: str,
    starting_offsets: str = "earliest",
    partitions: list[int] | None = None,
    offset_spec: "OffsetSpec | None" = None,
    min_partitions: int | None = None,
    end_offsets: dict[int, int] | None = None,
    metadata_timeout_ms: int | None = None,
    client_props: dict[str, str] | None = None,
) -> dict[str, str]:
    """Spark Kafka source options from the reference's offset/partition
    grammar (KwackMain.java:69-76): beginning|end -> earliest|latest;
    @<ts ms> -> startingTimestamp(s); <abs> -> per-partition offset JSON;
    -N -> absolute offsets computed from ``end_offsets`` (resolved via an
    admin client, jvm_end_offsets — Spark's source only understands the
    -2/-1 earliest/latest sentinels, never '-N before end');
    -p partitions -> assign JSON."""
    import json as _json

    opts: dict[str, str] = {
        "kafka.bootstrap.servers": bootstrap,
        "includeHeaders": "true",
    }
    if metadata_timeout_ms is not None:
        # reference -m/--metadata-timeout (KwackMain.java:61-63): bound every
        # broker metadata/admin request; the Kafka client's equivalents
        opts["kafka.request.timeout.ms"] = str(metadata_timeout_ms)
        opts["kafka.default.api.timeout.ms"] = str(metadata_timeout_ms)
    for k, v in (client_props or {}).items():
        # reference -X prop=val passthrough: raw Kafka client properties
        opts[f"kafka.{k}"] = str(v)
    if partitions:
        opts["assign"] = _json.dumps({topic: sorted(partitions)})
    else:
        opts["subscribe"] = topic
    if offset_spec is not None:
        if offset_spec.kind == "beginning":
            opts["startingOffsets"] = "earliest"
        elif offset_spec.kind == "end":
            opts["startingOffsets"] = "latest"
        elif offset_spec.kind == "timestamp":
            if partitions:
                opts["startingTimestamps"] = _json.dumps(
                    {topic: {str(p): offset_spec.value for p in partitions}}
                )
            else:
                opts["startingTimestamp"] = str(offset_spec.value)
        elif offset_spec.kind == "relative":
            if end_offsets is None:
                raise ValueError(
                    f"relative offset {offset_spec.value} needs per-partition "
                    "end offsets (jvm_end_offsets / end_offsets_fn) — Spark's "
                    "Kafka source has no '-N before end' form"
                )
            starts = resolve_relative_offsets(offset_spec.value, end_offsets)
            opts["startingOffsets"] = _json.dumps(
                {topic: {str(p): o for p, o in sorted(starts.items())}}
            )
        else:  # absolute per-partition offsets need partitions
            parts = partitions if partitions else [0]
            opts["startingOffsets"] = _json.dumps(
                {topic: {str(p): offset_spec.value for p in parts}}
            )
    else:
        opts["startingOffsets"] = starting_offsets
    if min_partitions:
        opts["minPartitions"] = str(min_partitions)
    return opts


def read_topic_frames(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    starting_offsets: str = "earliest",
    streaming: bool = False,
    min_partitions: int | None = None,
    partitions: list[int] | None = None,
    offset_spec: "OffsetSpec | None" = None,
    end_offsets_fn: Callable[..., dict[int, int]] | None = None,
    metadata_timeout_ms: int | None = None,
    client_props: dict[str, str] | None = None,
) -> DataFrame:
    """spark.read[Stream].format('kafka') — one task per topic-partition;
    raises a clear error when the Kafka connector jar is absent.

    ``end_offsets_fn(spark, bootstrap, topic, partitions)``: resolver for
    '-N before end' offset specs (default jvm_end_offsets, admin client)."""
    end_offsets = None
    if offset_spec is not None and offset_spec.kind == "relative":
        end_offsets = (end_offsets_fn or jvm_end_offsets)(
            spark, bootstrap, topic, partitions
        )
    reader = (spark.readStream if streaming else spark.read).format("kafka")
    for k, v in kafka_reader_options(
        bootstrap,
        topic,
        starting_offsets,
        partitions,
        offset_spec,
        min_partitions,
        end_offsets,
        metadata_timeout_ms,
        client_props,
    ).items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "Kafka source unavailable — the spark-sql-kafka connector package "
            "must be on the Spark classpath (spark.jars.packages="
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>)"
        ) from exc


def register_topics(
    spark: SparkSession,
    bootstrap: str,
    topics: list[str],
    serdes: dict[str, str] | None = None,
    key_serdes: dict[str, str] | None = None,
    registry: MockSchemaRegistry | None = None,
    starting_offsets: str = "earliest",
    streaming: bool = False,
    row_attributes: tuple[str, ...] = ("rowkey", "ksi", "vsi", "par", "off", "ts", "hdr"),
    skip_bytes: int = 0,
    topic_partitions: dict[str, list[int]] | None = None,
    offset_spec: "OffsetSpec | None" = None,
    on_error: str = "fail",
    end_offsets_fn: Callable[..., dict[int, int]] | None = None,
    metadata_timeout_ms: int | None = None,
    client_props: dict[str, str] | None = None,
) -> dict[str, DataFrame]:
    """One temp view per topic (the reference's CREATE TABLE per topic,
    KwackEngine.java:587-591)."""
    from kwack_spark.config import parse_serde

    out: dict[str, DataFrame] = {}
    for topic in topics:
        frames = read_topic_frames(
            spark,
            bootstrap,
            topic,
            starting_offsets,
            streaming,
            partitions=(topic_partitions or {}).get(topic),
            offset_spec=offset_spec,
            end_offsets_fn=end_offsets_fn,
            metadata_timeout_ms=metadata_timeout_ms,
            client_props=client_props,
        )
        decoded = decode_topic(
            frames,
            topic,
            value_serde=parse_serde((serdes or {}).get(topic, "latest")),
            key_serde=parse_serde((key_serdes or {}).get(topic, "binary")),
            registry=registry,
            row_attributes=row_attributes,
            skip_bytes=skip_bytes,
            on_error=on_error,
        )
        from kwack_spark.session import register_view

        register_view(decoded, topic)
        out[topic] = decoded
    return out
