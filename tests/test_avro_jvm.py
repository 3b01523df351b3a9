"""Gates for the JVM from_avro fast path (sources/avro_jvm.py).

The spark-avro module is absent in this environment, so the fast path can
never ACTIVATE here — these tests pin the gate logic (pure) and that
decode_topic falls back to the Python stage with identical results, which
is exactly the behavior a cluster without the jar gets."""

import json

import pytest

from kwack_spark.config import Serde, parse_serde
from kwack_spark.schema.registry import MockSchemaRegistry
from kwack_spark.sources import avro_jvm
from kwack_spark.sources import kafka as ks

SIMPLE = json.dumps(
    {
        "type": "record",
        "name": "E",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"], "default": None},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
            },
        ],
    }
)


def _serde(schema: str, **kw) -> Serde:
    return Serde(kind="avro", schema_str=schema, **kw)


def test_eligible_simple_record():
    ok, why = avro_jvm.eligible(_serde(SIMPLE), "t", None)
    assert ok, why


def test_ineligible_multibranch_union():
    s = json.dumps(
        {
            "type": "record",
            "name": "U",
            "fields": [{"name": "v", "type": ["int", "string"]}],
        }
    )
    ok, why = avro_jvm.eligible(_serde(s), "t", None)
    assert not ok and "union" in why


def test_ineligible_divergent_logical_types():
    for logical, base in (
        ("time-millis", "int"),
        ("time-micros", "long"),
        ("local-timestamp-micros", "long"),
    ):
        s = json.dumps(
            {
                "type": "record",
                "name": "L",
                "fields": [{"name": "t", "type": {"type": base, "logicalType": logical}}],
            }
        )
        ok, why = avro_jvm.eligible(_serde(s), "t", None)
        assert not ok and logical in why


def test_ineligible_tag_refs_nonrecord():
    ok, why = avro_jvm.eligible(_serde(SIMPLE, tag=("a", "b")), "t", None)
    assert not ok and "tag" in why
    ok, why = avro_jvm.eligible(_serde(SIMPLE, refs=(("X", "{}"),)), "t", None)
    assert not ok and "references" in why
    ok, why = avro_jvm.eligible(_serde('"string"'), "t", None)
    assert not ok and "record" in why


def test_evolution_gate_on_subject_versions():
    reg = MockSchemaRegistry()
    reg.register("t-value", SIMPLE, "AVRO")
    ok, why = avro_jvm.eligible(_serde(SIMPLE), "t", reg)
    assert ok, why
    # a second, different version under the subject -> per-record writer
    # resolution is possible -> Python path
    evolved = json.loads(SIMPLE)
    evolved["fields"].append({"name": "extra", "type": "int", "default": 0})
    reg.register("t-value", json.dumps(evolved), "AVRO")
    ok, why = avro_jvm.eligible(_serde(SIMPLE), "t", reg)
    assert not ok and "evolution" in why


def test_available_probe_is_false_and_memoized_here(spark):
    """No spark-avro jar in this environment: the probe must come back
    False (not raise), and memoize per session."""
    assert avro_jvm.available(spark) is False
    assert avro_jvm._AVAILABLE[spark] is False  # weak-keyed by the session
    assert avro_jvm.available(spark) is False


def test_decode_topic_falls_back_to_python_path(spark):
    """With the jar absent, an ELIGIBLE schema still decodes correctly via
    the Python stage — gate failure changes the physical plan, never the
    result."""
    from kwack_spark.schema import avro as avro_schema
    from tests.test_kafka_decode import make_frames

    reg = MockSchemaRegistry()
    sid = reg.register("t1-value", SIMPLE, "AVRO")
    assert avro_jvm.eligible(_serde(SIMPLE), "t1", reg)[0]
    payload = avro_schema.encode(
        # unions encode as (branch_index, value): ["null","string"] -> 1
        {"id": 7, "name": (1, "x"), "tags": ["a"], "ts": 1_700_000_000_000_000},
        SIMPLE,
    )
    out = ks.decode_topic(
        make_frames(spark, [ks.confluent_frame(payload, sid)]),
        "t1",
        parse_serde("latest"),
        registry=reg,
        row_attributes=("vsi", "off"),
    )
    row = out.collect()[0]
    assert row.id == 7 and row.name == "x" and row.tags == ["a"]
    assert row.rowinfo.vsi == sid and row.rowinfo.off == 0
    assert out.columns == ["id", "name", "tags", "ts", "rowinfo"]


def test_eligible_registry_errors_fall_back(spark):
    """A registry whose lookups raise non-KeyError (HTTP failures) must
    gate the fast path OFF, never crash decode."""
    from kwack_spark.config import Serde
    from kwack_spark.sources import avro_jvm

    class BoomRegistry:
        def subject_versions(self, subject):
            raise OSError("connection refused")

    serde = Serde(kind="avro", schema_str='{"type":"record","name":"R","fields":[{"name":"x","type":"long"}]}')
    ok, why = avro_jvm.eligible(serde, "t", BoomRegistry())
    assert not ok and "registry check failed" in why


def test_decode_value_col_rejects_skip():
    from kwack_spark.sources import avro_jvm
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fail"):
        avro_jvm.decode_value_col(None, "{}", "skip")
