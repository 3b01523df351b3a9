"""In-process schema registry (the reference's mock-SR equivalent,
KwackEngine.java:121,199-200,392-407): subjects hold versioned schemas, ids
are global, and externally-supplied schemas get registered so payloads can be
re-framed with a synthetic Confluent preamble and decoded by the one shared
path (KwackEngine.java:454-477).

The client surface matches what the decode stage needs: by-id lookup (writer
schema resolution from the wire preamble) and latest-by-subject (reader
schema at init).  A real Confluent Schema Registry would slot in behind the
same three methods via HTTP; the decode pipeline broadcasts a snapshot dict
(id -> schema) to executors, so lookup never happens per-record on the hot
path.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class RegisteredSchema:
    id: int
    subject: str
    version: int
    schema_type: str  # AVRO | JSON | PROTOBUF
    schema_str: str


class MockSchemaRegistry:
    def __init__(self):
        self._by_id: dict[int, RegisteredSchema] = {}
        self._subjects: dict[str, list[RegisteredSchema]] = {}
        self._next_id = 1

    def register(self, subject: str, schema_str: str, schema_type: str = "AVRO") -> int:
        versions = self._subjects.setdefault(subject, [])
        for rs in versions:
            if rs.schema_str == schema_str and rs.schema_type == schema_type:
                return rs.id
        rs = RegisteredSchema(
            id=self._next_id,
            subject=subject,
            version=len(versions) + 1,
            schema_type=schema_type,
            schema_str=schema_str,
        )
        self._next_id += 1
        versions.append(rs)
        self._by_id[rs.id] = rs
        return rs.id

    def by_id(self, schema_id: int) -> RegisteredSchema:
        if schema_id not in self._by_id:
            raise KeyError(f"schema id not found: {schema_id}")
        return self._by_id[schema_id]

    def latest(self, subject: str) -> RegisteredSchema:
        versions = self._subjects.get(subject)
        if not versions:
            raise KeyError(f"subject not found: {subject}")
        return versions[-1]

    def snapshot(self) -> dict[int, tuple[str, str]]:
        """id -> (schema_type, schema_str); broadcast to executors so writer
        schema resolution is a dict hit, not a registry call per record."""
        return {i: (rs.schema_type, rs.schema_str) for i, rs in self._by_id.items()}
