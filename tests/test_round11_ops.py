"""Round-11 unit tests: cluster-safe iterative scratch state, hot-key cap
ordering in the exact-key collision family, and the MinHash band-bucket cap
(r10 VERDICT next-round items #1/#2 + r10 ADVICE)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from kwack_spark.operators.graph import connected_components


# ---------------------------------------------------------------------------
# scratch-dir resolution + connected-components deep-iteration state
# ---------------------------------------------------------------------------


def test_deep_iteration_scratch_conf_and_cleanup(spark, tmp_path):
    """Past ``deep_rounds`` the label table parquet-materializes under the
    ``kwack.scratch.dir`` conf (the cluster-safe shared-FS location), round
    N-1 is deleted as round N is consumed, and the whole state dir is gone
    before the result is returned — while the returned labels stay
    collectable (pulled out via localCheckpoint before the rmtree)."""
    conf_dir = str(tmp_path / "scratch")
    spark.conf.set("kwack.scratch.dir", conf_dir)
    try:
        df = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 40)], ["id_a", "id_b"]
        )
        # max_collect_edges=0: this test exercises the DISTRIBUTED deep-
        # iteration scratch state, which the under-cap fast path skips
        out = connected_components(df, deep_rounds=2, max_iter=30, max_collect_edges=0)
        got = {r.node: r.component for r in out.collect()}
        assert got == {i: 1 for i in range(1, 41)}
        # conf honored: a session scratch root was created under it
        assert os.listdir(conf_dir), "scratch root not created under conf dir"
        # hygiene: no cc_state dir (nor any round parquet) survives the call
        assert not glob.glob(conf_dir + "/**/cc_state-*", recursive=True)
        # the result must remain usable after its parquet state was removed
        assert out.count() == 40
    finally:
        spark.conf.unset("kwack.scratch.dir")


def test_scratch_refuses_driver_local_on_cluster():
    """On a non-local master with neither kwack.scratch.dir nor a checkpoint
    dir, scratch allocation must FAIL LOUDLY: a driver-local tempdir is not
    a shared filesystem, and executors writing to their own /tmp followed by
    a driver re-read silently loses data (r10 VERDICT What's-wrong #1)."""
    from kwack_spark import scratch

    class FakeConf:
        def get(self, k, d=None):
            return d

    class FakeSC:
        master = "spark://host:7077"
        applicationId = "fake-app-r11"

        def getCheckpointDir(self):
            return None

    class FakeSpark:
        conf = FakeConf()
        sparkContext = FakeSC()

    with pytest.raises(RuntimeError, match="kwack.scratch.dir"):
        scratch._session_root(FakeSpark())


# ---------------------------------------------------------------------------
# exact-key collision family: the cap must prune BEFORE the pair join
# ---------------------------------------------------------------------------


def test_key_collision_cap_prunes_before_pair_join(spark):
    """The df-cap's semi-join must sit BELOW the pair self-join in the
    physical plan (r10 ADVICE): with no CBO join reorder, a post-pair
    ``join(rare)`` would still materialize O(df²) rows for an over-cap key
    on one shuffle key before dropping them.  The outermost join must be
    the pair join itself (condition ``id_a < id_b``), i.e. both inputs are
    already pruned."""
    from kwack_spark.operators.dedup import key_collision_pairs

    df = spark.createDataFrame(
        [(i, f"k{i % 3}") for i in range(24)], ["id", "key"]
    )
    p = key_collision_pairs(df, "key", "id", max_key_df=8)
    plan = p._jdf.queryExecution().executedPlan().toString()
    join_lines = [
        ln for ln in plan.splitlines() if "Join" in ln and "Exchange" not in ln
    ]
    assert join_lines, plan
    assert "id_a" in join_lines[0] and "<" in join_lines[0], (
        "outermost join is not the pair join — cap not pruned first:\n" + plan
    )
    # semantics: keys k0/k1 (8 ids each) kept, k2... 24 ids % 3 -> 8 each,
    # all <= 8 kept: C(8,2)*3 pairs
    assert p.count() == 28 * 3


def test_key_collision_pairs_drops_hot_key(spark):
    from kwack_spark.operators.dedup import key_collision_pairs

    rows = [(i, "hot") for i in range(10)] + [(100, "cold"), (101, "cold")]
    df = spark.createDataFrame(rows, ["id", "key"])
    got = {
        (r.id_a, r.id_b)
        for r in key_collision_pairs(df, "key", "id", max_key_df=4).collect()
    }
    assert got == {(100, 101)}


def test_key_collision_probe_drops_hot_history_key(spark):
    from kwack_spark.operators.dedup import key_collision_probe

    hist = spark.createDataFrame(
        [(i, "hot") for i in range(10)] + [(50, "cold")], ["id", "key"]
    )
    batch = spark.createDataFrame(
        [(200, "hot"), (201, "cold"), (202, "unseen")], ["id", "key"]
    )
    got = {
        (r.batch_id, r.hist_id)
        for r in key_collision_probe(
            hist, batch, "key", "id", max_key_df=4
        ).collect()
    }
    assert got == {(201, 50)}


# ---------------------------------------------------------------------------
# MinHash band hot-bucket cap
# ---------------------------------------------------------------------------


def _boilerplate_docs(spark):
    """12 byte-identical boilerplate docs (one giant band bucket) plus one
    genuine near-dup pair and one unique doc."""
    rows = [(i, "error page not found please try again later") for i in range(12)]
    rows += [
        (100, "the quick brown fox jumps over the lazy dog today"),
        (101, "the quick brown fox jumps over the lazy dog tonight"),
        (200, "completely unrelated text about spark partitions and shuffles"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_band_cap_prunes_boilerplate_cluster(spark):
    """A band bucket over max_band_df must contribute ZERO pairs (pruned
    before the self-join), while under-cap buckets still pair normally."""
    from kwack_spark.operators.dedup import minhash_lsh_pairs

    df = _boilerplate_docs(spark)
    uncapped = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5)
    assert uncapped.filter("id_a < 12 AND id_b < 12").count() == 66  # C(12,2)
    capped = minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.5, max_band_df=8
    )
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert not any(a < 12 for a, _ in got), got  # boilerplate gone
    assert (100, 101) in got  # genuine near-dup survives the cap


def test_lsh_overcap_band_clusters_emits_membership(spark):
    """Over-cap bands come back as ready-made clusters — the full member
    list with the bucket df, no pair enumeration."""
    from pyspark.sql import functions as F

    from kwack_spark.functions import text as TX
    from kwack_spark.operators.dedup import lsh_overcap_band_clusters

    ss = _boilerplate_docs(spark).select(
        "doc_id",
        F.array_distinct(TX.shingles(TX.tokens("text"), 3)).alias("sh"),
    )
    out = lsh_overcap_band_clusters(ss, "doc_id", max_band_df=8)
    rows = out.collect()
    # both bands of the identical docs saturate: 2 bands x 12 members
    assert len(rows) == 24
    assert {r.doc_id for r in rows} == set(range(12))
    assert all(r.band_df == 12 for r in rows)


# ---------------------------------------------------------------------------
# AVI/RIFF container video leg
# ---------------------------------------------------------------------------


def test_avi_container_roundtrip_and_parity():
    """The AVI writer produces a real RIFF form the chunk-walking parser
    recovers frame-exactly, matching the bare-MJPEG split of the same
    frames; malformed payloads degrade to None, never wrong frames."""
    from kwack_spark.operators import multimodal as mm

    frames = mm._video_frame_jpegs(7, 2, 12, 4)
    payload = mm._avi_container(frames)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    back = mm._avi_mjpeg_frames(payload)
    assert back == frames
    assert mm._mjpeg_split(b"".join(frames)) == frames
    assert mm._avi_mjpeg_frames(b"RIFFxxxxWAVE") is None
    assert mm._avi_mjpeg_frames(b"garbage") is None


def test_avi_keyframes_match_mjpeg_keyframes(spark):
    """Same frame semantics through both containers: the AVI leg's sampled
    (frame_no, fp) rows equal the MJPEG leg's for the same doc ids."""
    from kwack_spark.operators import multimodal as mm

    d = spark.createDataFrame([(i,) for i in range(0, 260, 13)], ["doc_id"])
    mj = mm.mjpeg_keyframes(
        mm.synth_mjpeg(d, "doc_id"), "payload", "doc_id", every_n=4
    )
    av = mm.avi_keyframes(
        mm.synth_avi_mjpeg(d, "doc_id"), "payload", "doc_id", every_n=4
    )
    a = {(r.doc_id, r.frame_no, r.fp) for r in mj.collect()}
    b = {(r.doc_id, r.frame_no, r.fp) for r in av.collect()}
    assert a == b and len(a) == 20 * 3


def test_single_scratch_allocation_site():
    """Hygiene invariant: tempfile.mkdtemp appears in exactly one engine
    source file (kwack_spark/scratch.py) — every staging dir allocates
    through the session-scoped scratch root that is cleaned at exit."""
    import pathlib
    import subprocess

    root = pathlib.Path(__file__).resolve().parent.parent / "kwack_spark"
    hits = [
        str(p)
        for p in root.rglob("*.py")
        if "tempfile" in p.read_text()
    ]
    assert hits == [str(root / "scratch.py")], hits
