"""Round-7 operator pins: the 64-bit LONG SimHash family.

- simhash64 fingerprint: bit i of the long must equal the majority
  high-bit of nibble i of the per-token md5('s0:'||t)||md5('s1:'||t)
  stream (checked against an independent Python md5 reference).
- simhash64_hamming_pairs: pigeonhole blocking must be lossless vs the
  brute-force all-pairs bit_count join, and must refuse unsound configs.
- simhash64_block_occupancy: candidate-pair mass must equal what the
  blocked self-join actually generates.
"""

import hashlib
import re

from pyspark.sql import functions as F

from kwack_spark.operators import dedup

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy dog tonight"),
    (3, "completely different text about spark streaming state"),
    (4, "the quick brown fox jumps over the lazy dog today"),
    (5, "unrelated words forming another distinct document body"),
    (6, "the quick brown fox jumps over the lazy dog this week"),
]


def _ref_simhash64(text: str) -> int:
    """Independent Python reference for TX.simhash64."""
    norm = re.sub(r"[^a-z ]", "", text.lower())
    toks = [t for t in norm.split(" ") if t]
    hashes = [
        hashlib.md5(f"s0:{t}".encode()).hexdigest()
        + hashlib.md5(f"s1:{t}".encode()).hexdigest()
        for t in toks
    ]
    fp = 0
    n = len(hashes)
    for i in range(64):
        set_count = sum(1 for h in hashes if h[i] in "89abcdef")
        if 2 * set_count >= n:
            fp |= 1 << i
    # to signed 64-bit
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def test_simhash64_matches_python_reference(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: r.fp
        for r in dedup.simhash64_fingerprints(d, "doc_id", "text").collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == _ref_simhash64(text), doc_id


def test_simhash64_blocking_is_lossless(spark):
    """16-bit-slice pigeonhole candidates must find EVERY pair within
    max_hamming — compare against brute-force bit_count(xor) all-pairs."""
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    blocked = dedup.simhash64_hamming_pairs(d, "doc_id", "text", max_hamming=3)
    fps = dedup.simhash64_fingerprints(d, "doc_id", "text")
    a = fps.select(F.col("doc_id").alias("id_a"), F.col("fp").alias("fp_a"))
    b = fps.select(F.col("doc_id").alias("id_b"), F.col("fp").alias("fp_b"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )
    assert sorted(map(tuple, blocked.collect())) == sorted(map(tuple, brute.collect()))
    # the fixture's exact-dup pair (1,4) must be found at distance 0
    rows = {(r.id_a, r.id_b): r.hamming for r in blocked.collect()}
    assert rows[(1, 4)] == 0


def test_simhash64_rejects_unsound_config():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash64_hamming_pairs(None, "doc_id", "text", max_hamming=4, blocks=4)
    with _pytest.raises(ValueError, match="divide"):
        dedup.simhash64_hamming_pairs(None, "doc_id", "text", max_hamming=3, blocks=5)


def test_simhash64_occupancy_accounts_candidates(spark):
    """sum over blocks of n_cand_pairs must equal the directed candidate
    count the slice self-join generates before dedup (each bucket of c rows
    contributes c*(c-1)/2 ordered pairs)."""
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    occ = dedup.simhash64_block_occupancy(d, "doc_id", "text").collect()
    sliced = dedup._simhash64_sliced(
        dedup.simhash64_fingerprints(d, "doc_id", "text"), "doc_id", 4
    )
    a = sliced.select(F.col("doc_id").alias("id_a"), "blk", "slc")
    b = sliced.select(F.col("doc_id").alias("id_b"), "blk", "slc")
    n_directed = (
        a.join(b, ["blk", "slc"]).filter(F.col("id_a") < F.col("id_b")).count()
    )
    assert sum(r.n_cand_pairs for r in occ) == n_directed
    assert [r.blk for r in occ] == [0, 1, 2, 3]


def test_incremental_simhash64_equals_batch_restriction(spark):
    """The persisted-index probe must emit exactly the batch pair set
    restricted to (batch doc, history doc) — nothing lost by probing a
    precomputed (id, fp) table instead of re-fingerprinting history."""
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    hist = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1)
    hist_fps = dedup.simhash64_fingerprints(hist, "doc_id", "text")
    inc = {
        (r.doc_id, r.hist_id): r.hamming
        for r in dedup.incremental_simhash64_new_dups(
            hist_fps, batch, "doc_id", "text", max_hamming=3
        ).collect()
    }
    full = dedup.simhash64_hamming_pairs(d, "doc_id", "text", max_hamming=3)
    want = {}
    for r in full.collect():
        # orient each cross-subset pair as (batch, hist)
        if r.id_a % 2 == 1 and r.id_b % 2 == 0:
            want[(r.id_a, r.id_b)] = r.hamming
        elif r.id_b % 2 == 1 and r.id_a % 2 == 0:
            want[(r.id_b, r.id_a)] = r.hamming
    assert inc == want and want, "expected non-empty cross-subset pair set"


def test_incremental_simhash64_never_touches_history_text(spark):
    """The probe's plan must read history only through the supplied
    fingerprint table: with history given as a literal (id, fp) frame,
    the operator runs with no access to any history text column."""
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    hist_fps_rows = dedup.simhash64_fingerprints(
        d.filter(F.col("doc_id") % 2 == 0), "doc_id", "text"
    ).collect()
    # literal index frame — the shape a production caller reads off disk
    idx = spark.createDataFrame(
        [(r.doc_id, r.fp) for r in hist_fps_rows], "doc_id long, fp long"
    )
    batch = d.filter(F.col("doc_id") % 2 == 1)
    out = dedup.incremental_simhash64_new_dups(
        idx, batch, "doc_id", "text", max_hamming=3
    )
    got = {(r.doc_id, r.hist_id, r.hamming) for r in out.collect()}
    via_text = dedup.incremental_simhash64_new_dups(
        dedup.simhash64_fingerprints(
            d.filter(F.col("doc_id") % 2 == 0), "doc_id", "text"
        ),
        batch,
        "doc_id",
        "text",
        max_hamming=3,
    )
    assert got == {(r.doc_id, r.hist_id, r.hamming) for r in via_text.collect()}


def test_stateful_simhash_neardup_equals_batch(spark, tmp_path):
    """End-of-stream pair set of the streaming member must equal the batch
    slice self-join bit-for-bit, regardless of micro-batch arrival order."""
    import uuid

    from kwack_spark.streaming import ingest as si

    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    prep = dedup._simhash64_sliced(
        dedup.simhash64_fingerprints(d, "doc_id", "text"), "doc_id", blocks=4
    )
    replay = str(tmp_path / "simhash_replay")
    # reversed-id order across 2 files: arrival order must not matter
    prep.orderBy(F.desc("doc_id")).repartition(2).write.mode("overwrite").parquet(
        replay
    )
    stream = (
        spark.readStream.schema(prep.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    sink = f"t7sh_{uuid.uuid4().hex[:8]}"
    q = si.to_memory_sink(
        si.stateful_simhash_neardup(stream, max_hamming=3), sink, "append"
    )
    assert q.awaitTermination(120)
    got = sorted(map(tuple, spark.table(sink).distinct().collect()))
    want = sorted(
        map(tuple, dedup.simhash64_hamming_pairs(d, "doc_id", "text").collect())
    )
    assert got == want and want


def test_simhash64_combo_blocking_is_lossless(spark):
    """Slice-PAIR blocking must find every pair within distance 6 —
    compared against the brute-force bit_count all-pairs join."""
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    blocked = dedup.simhash64_hamming_pairs_combo(
        d, "doc_id", "text", max_hamming=6, blocks=8
    )
    fps = dedup.simhash64_fingerprints(d, "doc_id", "text")
    a = fps.select(F.col("doc_id").alias("id_a"), F.col("fp").alias("fp_a"))
    b = fps.select(F.col("doc_id").alias("id_b"), F.col("fp").alias("fp_b"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
    )
    got = sorted(map(tuple, blocked.collect()))
    want = sorted(map(tuple, brute.collect()))
    assert got == want and want
    # and the d<=6 set must be a superset of the d<=3 single-slice set
    d3 = {
        (r.id_a, r.id_b)
        for r in dedup.simhash64_hamming_pairs(d, "doc_id", "text").collect()
    }
    assert d3 <= {(ia, ib) for ia, ib, _ in got}


def test_simhash64_combo_rejects_unsound_config():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="combo blocking"):
        dedup.simhash64_hamming_pairs_combo(
            None, "doc_id", "text", max_hamming=7, blocks=8
        )
    with _pytest.raises(ValueError, match="divide"):
        dedup.simhash64_hamming_pairs_combo(
            None, "doc_id", "text", max_hamming=3, blocks=7
        )
