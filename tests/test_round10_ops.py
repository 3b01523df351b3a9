"""Round-10 operators: hot-bucket guards for exact-key collision dedup
(batch df-cap + streaming state cap + at-least-once idempotency) and the
KLL register redelivery dedupe."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from kwack_spark.operators import dedup
from kwack_spark.streaming import ingest as si


def _pairs_set(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_key_collision_pairs_caps_ubiquitous_key(spark):
    """A key shared by > max_key_df ids (the black-frame / studio-logo
    case) is dropped before the self-join — its O(df²) pairs never
    materialize — while rare keys still pair."""
    rows = [(i, "black") for i in range(50)] + [
        (1, "rare"),
        (2, "rare"),
        (7, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    capped = dedup.key_collision_pairs(df, "k", "doc_id", max_key_df=10)
    assert _pairs_set(capped) == {(1, 2)}
    # uncapped control: the hot key explodes into 50*49/2 pairs
    full = dedup.key_collision_pairs(df, "k", "doc_id", max_key_df=10_000)
    assert full.count() == 50 * 49 // 2 + 1


def test_key_occupancy_audit_flags_hot_bucket(spark):
    rows = [(i, "black") for i in range(50)] + [(1, "rare"), (2, "rare")]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    row = dedup.key_occupancy_audit(df, "k", max_key_df=10).collect()[0]
    assert row.n_buckets == 2
    assert row.max_occupancy == 50
    assert row.n_cand_pairs == 50 * 49 // 2 + 1
    assert row.n_over_cap == 1


def _run_collision_stream(spark, tmp_path, rows, max_ids, n_files=3):
    path = str(tmp_path / f"kc_{uuid.uuid4().hex[:8]}")
    df = spark.createDataFrame(rows, "k string, doc_id long")
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    pairs = si.stateful_key_collision_pairs(
        stream, "k", "doc_id", max_ids=max_ids
    )
    sink = f"kc_sink_{uuid.uuid4().hex[:8]}"
    q = si.to_memory_sink(pairs, sink, output_mode="append")
    assert q.awaitTermination(120)
    return spark.table(sink)


def test_stateful_key_collision_idempotent_on_redelivery(spark, tmp_path):
    """At-least-once redelivery of a (key, id) row must not re-emit pairs
    or inflate the downstream shared-count rollup: replay each row twice
    and the pair multiset must equal the single-delivery batch join's."""
    base = [("a", 1), ("a", 2), ("a", 3), ("b", 1), ("b", 2)]
    redelivered = base + base  # every row delivered twice
    out = _run_collision_stream(spark, tmp_path, redelivered, max_ids=4096)
    counts = {
        (r.id_a, r.id_b): r.n
        for r in out.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # (1,2) shares keys a and b -> exactly 2; others exactly 1
    assert counts == {(1, 2): 2, (1, 3): 1, (2, 3): 1}


def test_stateful_key_collision_state_cap(spark, tmp_path):
    """A bucket at the max_ids cap stops accepting ids: pairs stay bounded
    at cap*(cap-1)/2 however many ids arrive on the hot key."""
    rows = [("black", i) for i in range(40)] + [("rare", 1), ("rare", 2)]
    out = _run_collision_stream(spark, tmp_path, rows, max_ids=5)
    got = _pairs_set(out)
    hot = {p for p in got if p != (1, 2)}
    assert (1, 2) in got  # rare key still pairs
    assert len(hot) == 5 * 4 // 2  # first 5 ids pair; the rest are dropped


def test_stateful_kll_registers_dedupe_redelivery(spark, tmp_path):
    """A redelivered (hr, rid) row overwrites its own register instead of
    duplicating it: replaying every row twice yields the SAME bottom-k
    register set as single delivery (the advertised merge-invariance).
    n_seen is the documented exception — a replay whose rank fell outside
    the k kept registers is indistinguishable from a new row with O(k)
    state — so it is bounded, not exact, under at-least-once."""
    base = [(1, h * 7919 % 97, h, h * 3) for h in range(20)]  # (g, hr, rid, v)
    for dup in (False, True):
        rows = base + base if dup else base
        path = str(tmp_path / f"kll_{dup}")
        df = spark.createDataFrame(rows, "g long, hr long, rid long, v long")
        df.repartition(4).write.mode("overwrite").parquet(path)
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        out = si.stateful_kll_registers(stream, "g", k=8)
        sink = f"kll_sink_{int(dup)}_{uuid.uuid4().hex[:8]}"
        q = si.to_memory_sink(out, sink, output_mode="update")
        assert q.awaitTermination(120)
        final = (
            spark.table(sink).orderBy(F.desc("n_seen")).limit(1).collect()[0]
        )
        if not dup:
            single = (final.n_seen, list(final.hrs), list(final.rids))
            assert final.n_seen == len(base)
        else:
            # registers bit-identical; n_seen bounded by [distinct, delivered]
            assert (list(final.hrs), list(final.rids)) == single[1:]
            assert len(base) <= final.n_seen <= 2 * len(base)


def test_mjpeg_split_roundtrip_and_malformed():
    """The marker-walk splitter recovers exactly the concatenated frames
    and rejects non-JPEG / truncated payloads instead of guessing."""
    import numpy as np

    from kwack_spark.operators.multimodal import (
        _dhash64_from_px,
        _jpeg_decode,
        _jpeg_encode,
        _mjpeg_split,
    )

    frames = []
    for t in range(3):
        px = np.full((16, 16), 10 + 40 * t, np.int32)
        frames.append(_jpeg_encode(px, 1))
    payload = b"".join(frames)
    got = _mjpeg_split(payload)
    assert got == frames
    # each split frame decodes standalone to the constant source
    for t, fr in enumerate(got):
        w, h, ch, px = _jpeg_decode(fr)
        assert (w, h, ch) == (16, 16, 1)
        assert int(px[0, 0]) == 10 + 40 * t
    assert _mjpeg_split(b"notajpeg") is None
    assert _mjpeg_split(payload[:-4]) is None  # truncated final frame
    # 16x16 is not 9-column reducible -> dHash refuses, never wrong
    assert _dhash64_from_px(16, 16, 1, px) is None


def test_mjpeg_keyframes_samples_and_decodes(spark):
    """mjpeg_keyframes keeps every Nth frame of the synthetic video and
    fingerprints it via the real decode: same (g, v) videos collide at
    distance 0, a modified keyframe is exactly 1 bit away."""
    from kwack_spark.operators import multimodal as mm

    # doc 3 and 67: same class g=3, variants v=0 and v=1
    d = spark.createDataFrame([(3,), (67,), (3 + 256,)], "doc_id long")
    vids = mm.synth_mjpeg(d, "doc_id", n_frames=12, every_n=4)
    kf = mm.mjpeg_keyframes(vids, "payload", "doc_id", every_n=4)
    rows = {(r.doc_id, r.frame_no): r.fp for r in kf.collect()}
    assert sorted(t for (did, t) in rows if did == 3) == [0, 4, 8]
    # same (g, v): identical fingerprints on every slot
    for t in (0, 4, 8):
        assert rows[(3, t)] == rows[(3 + 256, t)]
    # v=1 modifies slot 0 by exactly one bit, leaves slots 1-2 untouched
    mask = (1 << 64) - 1
    assert ((rows[(3, 0)] ^ rows[(67, 0)]) & mask).bit_count() == 1
    assert rows[(3, 4)] == rows[(67, 4)]
    assert rows[(3, 8)] == rows[(67, 8)]


def test_video_keyframe_dedup_cap_preserves_fixture(spark):
    """The df-capped video join equals the uncapped join on the fixture
    (max bucket ~8 at sf0.01 << 4096): the cap is dormant until a
    ubiquitous frame appears."""
    import kwack_spark.plans.pipeline as pl

    sf = "/root/testdata/sf0.001"
    kf = pl._video_keyframes(spark, sf)
    capped = pl._video_pair_rollup(
        dedup.key_collision_pairs(kf, "frame_md5", "doc_id", max_key_df=4096)
    )
    a = kf.select(F.col("doc_id").alias("id_a"), "frame_md5")
    b = kf.select(F.col("doc_id").alias("id_b"), "frame_md5")
    uncapped = pl._video_pair_rollup(
        a.join(b, "frame_md5").filter(F.col("id_a") < F.col("id_b"))
    )
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, uncapped.collect())
    )
