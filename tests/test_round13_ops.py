"""Round-13 unit tests: the optimization round's operator-internal
rewrites must be output-identical — the per-row MinHash signature frame
vs the explode+groupBy-min form, the vectorized stateful Hamming /
key-collision / LSH kernels (including the lowest-matching-slice
single-emission and the multi-chunk Arrow delivery path that the
one-shot-pdfs-iterator bug hid behind), and the table-lookup popcount."""

from __future__ import annotations

import contextlib
import uuid

import pytest
from pyspark.sql import functions as F

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),
    (3, "the quick brown fox jumps over the lazy cat again and again"),
    (4, "completely different text about distributed query engines"),
    (5, "completely different text about distributed query engines"),
    (6, "yet another unrelated document mentioning parquet files only"),
    (7, "the quick brown fox jumps over the lazy dog again and again extra"),
    (8, "short"),
]


@contextlib.contextmanager
def _tiny_arrow_batches(spark, n=4):
    """Force multi-chunk Arrow delivery into Python kernels: a stateful
    update function's ``pdfs`` iterator then yields several frames per
    group, which is the path the r13 vectorization must drain in ONE pass
    (a second iteration over the exhausted iterator silently sees nothing)."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, old)


def test_popcount64_matches_int_bit_count():
    import numpy as np

    from kwack_spark.streaming.ingest import _popcount64

    vals = [0, 1, (1 << 64) - 1, 0x8000000000000000, 0x0123456789ABCDEF]
    vals += [(v * 0x9E3779B97F4A7C15) & ((1 << 64) - 1) for v in range(1, 200)]
    arr = np.array(vals, dtype=np.uint64)
    got = _popcount64(arr)
    want = [v.bit_count() for v in vals]
    assert got.tolist() == want


def test_minhash_sig_frame_equals_groupby_form(spark):
    """The narrow per-row signature frame must be row-identical to the
    explode + groupBy-min form for every (doc, member)."""
    from kwack_spark.functions import text as TX
    from kwack_spark.operators import dedup

    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    ss = d.select(
        "doc_id",
        F.array_distinct(TX.shingles(TX.tokens("text"), 3)).alias("sh"),
    )
    narrow = dedup._minhash_sig_frame(ss, "doc_id", 8)
    ex = ss.select("doc_id", F.explode("sh").alias("s"))

    def member(i: int):
        seed, off = TX.minhash_seed_slice(i)
        return F.min(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), F.col("s"))), off, 8)
        ).alias(f"mh{i}")

    grouped = ex.groupBy("doc_id").agg(*[member(i) for i in range(8)])
    got = sorted(map(tuple, narrow.collect()))
    want = sorted(map(tuple, grouped.collect()))
    assert got == want and len(want) == len(DOCS)


def test_stateful_simhash_vectorized_chunked_equals_batch(spark, tmp_path):
    """The vectorized Hamming kernel under multi-chunk Arrow delivery:
    end-of-stream distinct pairs == the batch slice self-join, AND the raw
    sink holds each pair exactly once per delivery (lowest-matching-slice
    emission: identical-fingerprint pairs used to be emitted once per
    matching slice bucket, 4x)."""
    from kwack_spark.operators import dedup
    from kwack_spark.streaming import ingest as si

    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    prep = dedup._simhash64_sliced(
        dedup.simhash64_fingerprints(d, "doc_id", "text"), "doc_id", blocks=4
    )
    replay = str(tmp_path / "sh13_replay")
    prep.orderBy(F.desc("doc_id")).repartition(2).write.mode("overwrite").parquet(
        replay
    )
    stream = (
        spark.readStream.schema(prep.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    sink = f"t13sh_{uuid.uuid4().hex[:8]}"
    with _tiny_arrow_batches(spark):
        q = si.to_memory_sink(
            si.stateful_simhash_neardup(stream, max_hamming=3), sink, "append"
        )
        assert q.awaitTermination(120)
    raw = spark.table(sink)
    got = sorted(map(tuple, raw.distinct().collect()))
    want = sorted(
        map(tuple, dedup.simhash64_hamming_pairs(d, "doc_id", "text").collect())
    )
    assert got == want and want
    # single-delivery replay: one emission per matching pair, no slice dupes
    assert raw.count() == raw.distinct().count()


def test_stateful_key_collision_vectorized_chunked_multiset(spark, tmp_path):
    """The vectorized key-collision kernel under multi-chunk Arrow
    delivery must keep the pair MULTISET (downstream counts recover the
    shared-key count), the idempotent-redelivery rule, and the id cap."""
    from kwack_spark.streaming import ingest as si

    rows = [("a", i) for i in range(11, 21)] + [("b", 1), ("b", 2), ("b", 2)]
    df = spark.createDataFrame(rows, "k string, doc_id long")
    path = str(tmp_path / "kc13")
    df.repartition(2).write.mode("overwrite").parquet(path)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    sink = f"t13kc_{uuid.uuid4().hex[:8]}"
    with _tiny_arrow_batches(spark):
        q = si.to_memory_sink(
            si.stateful_key_collision_pairs(stream, "k", "doc_id", max_ids=5),
            sink,
            "append",
        )
        assert q.awaitTermination(120)
    counts = {
        (r.id_a, r.id_b): r.n
        for r in spark.table(sink)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # key a: capped at 5 ids -> exactly C(5,2) pairs among the first five
    # accepted arrivals; key b: the redelivered (b, 2) must not re-emit ->
    # exactly one (1, 2) row
    assert counts[(1, 2)] == 1
    assert sum(counts.values()) == 5 * 4 // 2 + 1


def test_stateful_lsh_vectorized_chunked_equals_batch(spark, tmp_path):
    """The indicator-matrix Jaccard path under multi-chunk delivery:
    end-of-stream distinct pairs (and their float jaccards) must equal the
    batch minhash_lsh_pairs values bit-for-bit."""
    from kwack_spark.operators import dedup
    from kwack_spark.streaming import ingest as si

    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    prep = dedup.lsh_band_keys_narrow(d, "doc_id", "text", k=8, bands=2)
    replay = str(tmp_path / "lsh13")
    prep.repartition(2, F.col("doc_id")).write.mode("overwrite").parquet(replay)
    stream = (
        spark.readStream.schema(prep.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    sink = f"t13lsh_{uuid.uuid4().hex[:8]}"
    with _tiny_arrow_batches(spark):
        q = si.to_memory_sink(
            si.stateful_lsh_neardup(stream, threshold=0.5), sink, "append"
        )
        assert q.awaitTermination(120)
    got = sorted(map(tuple, spark.table(sink).distinct().collect()))
    want = sorted(
        map(
            tuple,
            dedup.minhash_lsh_pairs(
                d, "doc_id", "text", k=8, bands=2, threshold=0.5
            ).collect(),
        )
    )
    assert got == want and want
