"""JVM whole-stage Avro decode fast path for evolution-free topics.

The Python decode stage (sources/kafka.py:decode_topic) is the general path:
it handles writer-schema evolution (per-record schema ids), multi-branch
union tagging, and key-field injection — semantics Spark's built-in
``from_avro`` cannot express.  But MOST production topics are none of those
things: one writer schema, a plain record, no unions beyond [null, T].  For
those, decoding per record in Python costs ~10x the reference's per-record
Java (KwackEngine.java:516-585 dispatches to Confluent's Java
deserializers); ``from_avro`` keeps the whole scan+decode inside
whole-stage codegen.

This module gates that fast path on three independently checkable facts:

1. availability — the spark-avro external module is on the classpath
   (``from_avro`` fails ANALYSIS with AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE
   otherwise; probed once per session, never per query);
2. no evolution — every schema registered under the topic's value subject
   is parse-identical to the reader, so per-record writer resolution is a
   no-op (records with unknown ids decode with the reader schema on both
   paths);
3. schema compatibility — the reader schema maps to the SAME Spark type
   under this repo's matrix (schema/avro.py:to_spark_type, SURVEY §1.3) and
   spark-avro's SchemaConverters.  The divergences are enumerated in
   _compat_reason: multi-branch unions (struct-of-branches u<i> here vs
   memberN there), time-millis/micros (long micros here vs int/long there),
   timestamp-nanos / local-timestamp-* (long here vs TimestampNTZ there),
   duration (lossless months/days/millis struct here vs opaque fixed
   there), and null-only fields.

Anything failing a gate silently uses the Python path — identical results,
just slower; decode_topic never changes behavior, only its physical plan.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kwack_spark.schema import avro as avro_schema

# session-keyed probe memo (a session restart can add the jar).  Weak keys:
# an id()-keyed dict would alias a NEW session allocated at a dead one's
# address and inherit its stale probe result.
import weakref

_AVAILABLE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()

_PROBE_SCHEMA = '{"type":"record","name":"_probe","fields":[]}'

# logical types whose Spark mapping here matches spark-avro's
_OK_LOGICAL = {
    None: True,
    "date": True,
    "timestamp-millis": True,
    "timestamp-micros": True,
    "decimal": True,
    "uuid": True,  # string on both sides
}


def available(spark: SparkSession) -> bool:
    """Can ``from_avro`` analyze in this session?  Probes ONCE by analyzing
    (not running) a trivial plan; the spark-avro module raises
    AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE at analysis when absent."""
    if spark not in _AVAILABLE:
        try:
            from pyspark.sql.avro.functions import from_avro

            df = spark.range(1).select(F.lit(b"x").alias("v"))
            df.select(from_avro("v", _PROBE_SCHEMA)).schema  # analysis only
            _AVAILABLE[spark] = True
        except Exception:
            _AVAILABLE[spark] = False
    return _AVAILABLE[spark]


def _compat_reason(node: Any) -> str | None:
    """None if spark-avro would produce the SAME Spark type/value as this
    repo's matrix for ``node`` (already parse_schema-resolved); else a
    human-readable reason the Python path must keep the query."""
    node, _ = avro_schema.nullable_unwrap(node)
    t = node.get("type")
    logical = node.get("logicalType")
    if t == "union":
        return "multi-branch union (struct-of-branches tagging is Python-path)"
    if t == "null":
        return "null-only field"
    if logical is not None and logical not in _OK_LOGICAL:
        return f"logical type {logical!r} maps differently in spark-avro"
    if t == "record":
        for f in node["fields"]:
            r = _compat_reason(f["type"])
            if r:
                return r
        return None
    if t == "array":
        return _compat_reason(node["items"])
    if t == "map":
        return _compat_reason(node["values"])
    # primitives, enum (string both sides), fixed/bytes (+decimal) all match
    return None


def eligible(
    value_serde,
    topic: str,
    registry,
) -> tuple[bool, str]:
    """Pure gate (no Spark needed): (ok, reason).  ``value_serde`` must be
    the post-resolve_serde concrete serde (kind 'avro')."""
    if value_serde.kind != "avro":
        return False, f"serde kind {value_serde.kind!r}"
    if value_serde.tag is not None:
        return False, "key-field injection (;tag:) needs the Python path"
    if value_serde.refs:
        return False, "schema references: from_avro needs a self-contained schema"
    try:
        reader = avro_schema.parse_schema(value_serde.schema_str)
    except Exception as exc:
        return False, f"unparseable schema: {exc}"
    base, _ = avro_schema.nullable_unwrap(reader)
    if base.get("type") != "record":
        return False, "non-record top level flattens differently"
    r = _compat_reason(reader)
    if r:
        return False, r
    if registry is not None:
        subject = f"{topic}-value"
        try:
            versions = registry.subject_versions(subject)
        except KeyError:
            versions = []  # no registered subject -> inline schema governs
        except Exception as exc:
            # registry unreachable / HTTP error: be conservative — an
            # unverifiable evolution gate means the Python path (which
            # resolves per-record writer schemas) keeps the query
            return False, f"registry check failed: {exc!r}"
        for rs in versions:
            if rs.schema_type != "AVRO":
                return False, f"{subject} v{rs.version} is {rs.schema_type}"
            try:
                same = avro_schema.parse_schema(rs.schema_str) == reader
            except Exception as exc:
                return False, (
                    f"{subject} v{rs.version} unparseable standalone "
                    f"(references?): {exc}"
                )
            if not same:
                return False, (
                    f"writer evolution: {subject} v{rs.version} differs from "
                    "the reader (per-record resolution needs the Python path)"
                )
    return True, "ok"


def decode_value_col(
    payload: Column, schema_str: str, on_error: str
) -> Column:
    """``from_avro`` over an already-unframed payload column.  Fail mode
    only: FAILFAST raises on poison exactly like the Python decoder's
    fail mode.  'skip' is rejected — spark-avro's PERMISSIVE mode turns a
    corrupt record into an all-null-FIELDS struct (not a NULL struct),
    indistinguishable from a legitimate all-null record, so poison-skip
    semantics cannot be honored on this path (decode_topic keeps 'skip'
    topics on the Python stage)."""
    if on_error != "fail":
        raise ValueError(
            "JVM from_avro fast path supports on_error='fail' only; "
            "'skip' requires the Python decode stage"
        )
    from pyspark.sql.avro.functions import from_avro

    return from_avro(payload, schema_str, {"mode": "FAILFAST"})
