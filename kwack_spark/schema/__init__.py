"""Schema transformers: Avro / JSON Schema / Protobuf -> Spark StructType,
plus pure-Python binary codecs for the decode path.

This is the rebuild of the reference's largest asset — the transformer layer
(/root/reference/src/main/java/io/kcache/kwack/transformer/, ~2,500 LoC) —
re-expressed for Spark: each transformer maps a parsed schema to a
``StructType`` (the reference emits DuckDB DDL instead) and provides a
record -> row converter used by the Arrow-batched decode stage in
kwack_spark/sources/kafka.py.

Type-mapping decisions follow SURVEY.md §1.3's matrix (one documented
encoding per gap — TIME, ENUM, UNION, unsigned, nanos — applied identically
in the ingest mapper and the oracle normalizer).
"""
