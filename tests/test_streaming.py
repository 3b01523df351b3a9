"""Structured Streaming ingest tests: the batch decode pipeline running
continuously (file-source frame stream -> decode -> stateful ops -> memory
sink, Trigger.AvailableNow).  The operators are identical under a Kafka
source; only the frame provider differs."""

import datetime
import json

import pytest
from pyspark.sql import functions as F

from kwack_spark.config import Serde
from kwack_spark.schema import avro as avro_schema
from kwack_spark.schema.registry import MockSchemaRegistry
from kwack_spark.sources import kafka as ks
from kwack_spark.streaming import ingest as si

AVRO = {
    "type": "record",
    "name": "Ev",
    "fields": [
        {"name": "uid", "type": "int"},
        {"name": "val", "type": "double"},
    ],
}

TS0 = datetime.datetime(2024, 1, 1)


def _write_frames(spark, path, n=20):
    reg = MockSchemaRegistry()
    sid = reg.register("evs-value", json.dumps(AVRO), "AVRO")
    rows = []
    for i in range(n):
        payload = ks.confluent_frame(
            avro_schema.encode({"uid": i % 3, "val": float(i)}, AVRO), sid
        )
        rows.append(
            (None, payload, "evs", 0, i, TS0 + datetime.timedelta(minutes=7 * i), 0, None)
        )
    spark.createDataFrame(rows, ks.KAFKA_FRAME_SCHEMA).write.mode("overwrite").parquet(path)
    return reg


def test_stream_decode_matches_batch(spark, tmp_path):
    """One decode path, two modes: streaming decode of the same frames equals
    the batch decode."""
    path = str(tmp_path / "frames")
    reg = _write_frames(spark, path)

    stream = si.stream_frames_from_dir(spark, path)
    assert stream.isStreaming
    decoded = si.decode_stream(
        stream, "evs", Serde(kind="latest"), registry=reg, row_attributes=("off",)
    )
    q = si.to_memory_sink(decoded, "evs_stream")
    q.awaitTermination(60)

    got = spark.table("evs_stream").select("uid", "val").collect()
    batch = ks.decode_topic(
        spark.read.parquet(path), "evs", Serde(kind="latest"), registry=reg,
        row_attributes=("off",),
    ).select("uid", "val").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert len(got) == 20


def test_stream_windowed_counts(spark, tmp_path):
    """Watermarked tumbling windows over the decoded stream equal the batch
    window aggregation (the batch run IS the oracle)."""
    path = str(tmp_path / "frames")
    reg = _write_frames(spark, path)

    def pipeline(frames):
        decoded = ks.decode_topic(
            frames, "evs", Serde(kind="latest"), registry=reg, row_attributes=("ts",)
        )
        evs = decoded.withColumn(
            "ets", F.timestamp_millis(F.col("rowinfo.ts"))
        )
        return si.windowed_counts(
            evs, "ets", keys=["uid"], window="1 hour", watermark="5 minutes",
            agg_exprs=[
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("val").cast("decimal(18,3)")).cast("double").alias("total"),
            ],
        )

    # complete mode emits open windows too — end-of-stream parity with batch
    # (append mode would hold back windows the watermark hasn't finalized)
    q = si.to_memory_sink(
        pipeline(si.stream_frames_from_dir(spark, path)), "evs_win", output_mode="complete"
    )
    q.awaitTermination(60)
    got = sorted(map(tuple, spark.table("evs_win").collect()))
    batch = sorted(map(tuple, pipeline(spark.read.parquet(path)).collect()))
    assert got == batch and len(got) > 0


def test_stream_session_and_dedup(spark, tmp_path):
    path = str(tmp_path / "frames")
    reg = _write_frames(spark, path)
    frames = si.stream_frames_from_dir(spark, path)
    decoded = ks.decode_topic(
        frames, "evs", Serde(kind="latest"), registry=reg, row_attributes=("ts",)
    ).withColumn("ets", F.timestamp_millis(F.col("rowinfo.ts")))

    q1 = si.to_memory_sink(
        si.session_counts(decoded, "ets", keys=["uid"], gap="15 minutes"),
        "evs_sess",
        output_mode="complete",
    )
    q1.awaitTermination(60)
    sess = spark.table("evs_sess").collect()
    # 7-minute spacing per uid stream = 21-minute gaps per uid -> every event
    # its own session for gap=15m
    assert sum(r.n_events for r in sess) == 20

    q2 = si.to_memory_sink(
        si.streaming_dedup(decoded.select("uid", "ets"), "ets", keys=["uid"]),
        "evs_dedup",
    )
    q2.awaitTermination(60)
    # only exact (uid) dupes within the watermark horizon are dropped; with
    # 21-min spacing vs 10-min watermark every row survives... except equal
    # keys arriving inside the horizon.  Just assert the op ran and bounded.
    assert 3 <= spark.table("evs_dedup").count() <= 20


def test_stateful_running_counts(spark, tmp_path):
    """applyInPandasWithState custom operator: end-of-stream per-key totals
    equal the batch groupBy count."""
    path = str(tmp_path / "frames")
    reg = _write_frames(spark, path)
    frames = si.stream_frames_from_dir(spark, path)
    decoded = ks.decode_topic(
        frames, "evs", Serde(kind="latest"), registry=reg, row_attributes=("off",)
    )
    counts = si.stateful_running_counts(decoded, "uid")
    q = si.to_memory_sink(counts, "evs_state", output_mode="update")
    q.awaitTermination(60)
    # last emitted total per key (update mode may emit once per batch)
    got = {
        r.uid: r.n
        for r in spark.table("evs_state").orderBy("n").collect()
    }
    batch = {
        r.uid: r.cnt
        for r in ks.decode_topic(
            spark.read.parquet(path), "evs", Serde(kind="latest"), registry=reg,
            row_attributes=("off",),
        ).groupBy("uid").count().withColumnRenamed("count", "cnt").collect()
    }
    assert got == batch

def test_stateful_lsh_neardup_order_invariant(spark, tmp_path):
    """Streaming LSH near-dup emits the same pair set as the batch self-join
    regardless of arrival order: replay the same docs in ascending and
    descending id order and compare against minhash_lsh_pairs."""
    from kwack_spark.operators import dedup

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "completely different text about spark streaming state"),
        (4, "the quick brown fox jumps over the lazy dog today"),
        (5, "unrelated words forming another distinct document body"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    batch_pairs = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(
            d, "doc_id", "text", k=8, bands=2, threshold=0.5
        ).collect()
    }
    assert batch_pairs  # fixture must actually produce near-dups

    prep = dedup.lsh_band_keys_narrow(d, "doc_id", "text", k=8, bands=2)
    # two MULTI-file replays with different batch compositions (hash vs
    # range placement) — with maxFilesPerTrigger=1 each file is its own
    # micro-batch, so cross-batch state (the JSON round-trip and the
    # history-vs-batch compare) is genuinely exercised, in different
    # arrival orders across the two runs
    for tag, frame in (
        ("hash", prep.repartition(3, "doc_id")),
        ("range", prep.repartitionByRange(3, F.col("doc_id").desc())),
    ):
        path = str(tmp_path / f"lsh_{tag}")
        frame.write.mode("overwrite").parquet(path)
        import glob

        assert len(glob.glob(f"{path}/part-*.parquet")) > 1, "need multi-batch replay"
        stream = (
            spark.readStream.schema(prep.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        q = si.to_memory_sink(
            si.stateful_lsh_neardup(stream, threshold=0.5),
            f"lshnd_{tag}",
            output_mode="append",
        )
        assert q.awaitTermination(120), "stream did not finish"
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in spark.table(f"lshnd_{tag}").distinct().collect()
        }
        assert got == batch_pairs, tag


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (purchases x preceding clicks per user)
    equals the same join run in batch — the batch run is the oracle."""
    from kwack_spark.sources.parquet import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    p_dir, c_dir = str(tmp_path / "purchases"), str(tmp_path / "clicks")
    purchases = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_val")
    )
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("click_id")
    )
    purchases.write.mode("overwrite").parquet(p_dir)
    clicks.write.mode("overwrite").parquet(c_dir)

    def joined(l, r):
        return si.stream_interval_join(
            l, r, "user_id", "p_ts", "c_ts", lookback="1 hour", watermark="2 hours"
        ).select("user_id", "p_ts", "c_ts", "click_id")

    sp = spark.readStream.schema(purchases.schema).parquet(p_dir)
    sc = spark.readStream.schema(clicks.schema).parquet(c_dir)
    q = si.to_memory_sink(joined(sp, sc), "pj", output_mode="append")
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.table("pj").collect()))
    batch = sorted(
        map(tuple, joined(spark.read.parquet(p_dir), spark.read.parquet(c_dir)).collect())
    )
    assert got == batch and len(got) > 0


def test_engine_live_topic_sees_late_rows(spark, tmp_path):
    """The engine's live-table mode: re-query sees records that arrive
    AFTER registration — the reference's background-consumption semantics
    (KwackEngine.java:745-774; interactive session sees late rows on
    re-query, SURVEY §1.1)."""
    from kwack_spark.engine import KwackSpark
    from kwack_spark.config import KwackConfig

    path = str(tmp_path / "frames")
    reg = MockSchemaRegistry()
    sid = reg.register("live_evs-value", json.dumps(AVRO), "AVRO")

    def batch(start, n, sub):
        rows = []
        for i in range(start, start + n):
            payload = ks.confluent_frame(
                avro_schema.encode({"uid": i, "val": float(i)}, AVRO), sid
            )
            rows.append(
                (None, payload, "live_evs", 0, i,
                 TS0 + datetime.timedelta(seconds=i), 0, None)
            )
        spark.createDataFrame(rows, ks.KAFKA_FRAME_SCHEMA).write.mode(
            "overwrite"
        ).parquet(f"{path}/{sub}")

    batch(0, 5, "b1")
    eng = KwackSpark(KwackConfig(), spark=spark, registry=reg)
    q = eng.register_live_topic(
        "live_evs", value_serde=Serde(kind="latest"), frames_dir=f"{path}/*"
    )
    try:
        q.processAllAvailable()
        assert eng.sql("SELECT count(*) AS n FROM live_evs").collect()[0].n == 5

        batch(5, 3, "b2")  # late arrivals after registration
        q.processAllAvailable()
        got = eng.sql(
            "SELECT count(*) AS n, max(uid) AS mx FROM live_evs"
        ).collect()[0]
        assert got.n == 8 and got.mx == 7
    finally:
        q.stop()


def test_stateful_lsh_ttl_evicts_aged_buckets(spark, tmp_path):
    """With a processing-time TTL, a bucket idle past the horizon is evicted:
    a later near-dup of an aged-out doc produces NO pair, while the no-TTL
    run still pairs them.  Batches are separate files processed one per
    trigger; batch 2 touches only an unrelated bucket so bucket state from
    batch 1 can time out before its near-dup arrives in batch 3.

    The TTL run uses a continuous trigger: under a processing-time timeout
    Spark schedules batches indefinitely (documented caveat), so neither
    Trigger.AvailableNow (never terminates) nor processAllAvailable (keeps
    finding pending timeout batches) can drain-and-stop — instead we poll
    recentProgress until all 3 source rows are processed, then stop."""
    import glob
    import shutil
    import time

    from kwack_spark.operators import dedup
    from kwack_spark.streaming import ingest as si

    b1 = [(1, "the quick brown fox jumps over the lazy dog today")]
    b2 = [(3, "completely different text about spark streaming state")]
    b3 = [(4, "the quick brown fox jumps over the lazy dog today")]

    def replay(tag, ttl_ms):
        path = str(tmp_path / f"ttl_{tag}")
        shutil.rmtree(path, ignore_errors=True)
        for rows in (b1, b2, b3):
            d = spark.createDataFrame(rows, "doc_id long, text string")
            prep = dedup.lsh_band_keys_narrow(d, "doc_id", "text", k=8, bands=2)
            prep.coalesce(1).write.mode("append").parquet(path)
            time.sleep(0.05)  # distinct mtimes -> stable per-file batch order
        assert len(glob.glob(f"{path}/part-*.parquet")) == 3
        stream = (
            spark.readStream.schema(prep.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        pairs = si.stateful_lsh_neardup(stream, threshold=0.5, ttl_ms=ttl_ms)
        q = si.to_memory_sink(
            pairs, f"lshttl_{tag}", output_mode="append", continuous=ttl_ms is not None
        )
        if ttl_ms is None:
            assert q.awaitTermination(120), "stream did not finish"
        else:
            deadline = time.time() + 120
            while time.time() < deadline:
                done = sum(p["numInputRows"] for p in q.recentProgress)
                if done >= 3:
                    break
                time.sleep(0.2)
            else:
                q.stop()
                raise AssertionError("TTL stream never consumed all 3 rows")
            q.stop()
            q.awaitTermination(30)
        return {
            (r.id_a, r.id_b) for r in spark.table(f"lshttl_{tag}").distinct().collect()
        }

    # no TTL: docs 1 and 4 are near-dups across batches 1 and 3
    assert replay("off", None) == {(1, 4)}
    # 1 ms TTL: bucket holding doc 1 idles through batch 2, times out, and
    # doc 4 finds empty state
    assert replay("on", 1) == set()


def test_idempotent_sink_batch_redelivery(spark, tmp_path):
    """Re-calling the foreachBatch body with the same batch id (the
    crash-replay case) must leave the landed row set unchanged."""
    from kwack_spark.streaming import sink as sk

    land = str(tmp_path / "land")
    d = spark.range(10).selectExpr("id", "id * 2 AS v")
    write = sk.idempotent_batch_writer(land)
    write(d, 0)
    write(d, 0)  # re-delivery
    got = sk.read_sink(spark, land)
    assert got.count() == 10
    assert {r.id for r in got.collect()} == set(range(10))


def test_idempotent_sink_resume_processes_only_new_input(spark, tmp_path):
    """Second availableNow run on the same checkpoint must land ONLY the
    input that arrived between runs — no reprocessing, no loss."""
    from kwack_spark.streaming import sink as sk

    src = str(tmp_path / "src")
    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    first = spark.range(0, 50).selectExpr("id")
    first.coalesce(1).write.mode("append").parquet(src)

    schema = first.schema

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        q = sk.to_idempotent_parquet_sink(stream, land, ckpt)
        assert q.awaitTermination(120), "sink did not drain"

    def batch_dirs():
        import glob as g

        return sorted(
            int(p.rsplit("=", 1)[1])
            for p in g.glob(f"{land}/{sk.PARTITION_COL}=*")
        )

    drain()
    assert sk.read_sink(spark, land).count() == 50
    first_dirs = batch_dirs()
    # new arrivals between runs
    spark.range(50, 80).selectExpr("id").coalesce(1).write.mode("append").parquet(src)
    drain()
    got = sk.read_sink(spark, land)
    assert got.count() == 80
    assert {r.id for r in got.collect()} == set(range(80))
    # resume really resumed: the first run's batch dirs are untouched and
    # the new rows landed ONLY in new batch ids.  (Without this check a
    # broken checkpoint that reprocesses everything into batch 0 would
    # still produce the right 80-row union and the count asserts above
    # would pass vacuously.)
    assert batch_dirs()[: len(first_dirs)] == first_dirs
    assert len(batch_dirs()) > len(first_dirs)
    old_rows = spark.read.parquet(
        *[f"{land}/{sk.PARTITION_COL}={b}" for b in first_dirs]
    )
    assert {r.id for r in old_rows.collect()} == set(range(50))


def test_engine_live_topic_durable_sink(spark, tmp_path):
    """Live-table mode with durable landing: table <topic> is a view over
    the exactly-once parquet sink, late rows appear on re-query, and the
    landed dataset is readable by an external engine (DuckDB) without
    Spark's _spark_metadata log."""
    import duckdb

    from kwack_spark.config import KwackConfig
    from kwack_spark.engine import KwackSpark

    path = str(tmp_path / "frames")
    land = str(tmp_path / "land")
    reg = MockSchemaRegistry()
    sid = reg.register("live_dur-value", json.dumps(AVRO), "AVRO")

    def batch(start, n, sub):
        rows = []
        for i in range(start, start + n):
            payload = ks.confluent_frame(
                avro_schema.encode({"uid": i, "val": float(i)}, AVRO), sid
            )
            rows.append(
                (None, payload, "live_dur", 0, i,
                 TS0 + datetime.timedelta(seconds=i), 0, None)
            )
        spark.createDataFrame(rows, ks.KAFKA_FRAME_SCHEMA).write.mode(
            "overwrite"
        ).parquet(f"{path}/{sub}")

    batch(0, 5, "b1")
    eng = KwackSpark(KwackConfig(), spark=spark, registry=reg)
    q = eng.register_live_topic(
        "live_dur",
        value_serde=Serde(kind="latest"),
        frames_dir=f"{path}/*",
        durable_path=land,
    )
    try:
        q.processAllAvailable()
        assert eng.sql("SELECT count(*) AS n FROM live_dur").collect()[0].n == 5

        batch(5, 3, "b2")  # late arrivals after registration
        q.processAllAvailable()
        got = eng.sql(
            "SELECT count(*) AS n, max(uid) AS mx FROM live_dur"
        ).collect()[0]
        assert got.n == 8 and got.mx == 7
    finally:
        q.stop()

    # cross-engine readability: plain partitioned parquet, no metadata log
    n = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{land}/kw_batch_id=*/*.parquet')"
    ).fetchone()[0]
    assert n == 8


def test_compact_sink_preserves_rows(spark, tmp_path):
    """Compaction rewrites the per-batch directories into the planned
    number of balanced files with the identical row set."""
    import glob

    from kwack_spark.streaming import sink as sk

    land = str(tmp_path / "land")
    out = str(tmp_path / "compacted")
    write = sk.idempotent_batch_writer(land)
    for b in range(5):
        write(spark.range(b * 10, b * 10 + 10).selectExpr("id"), b)

    files = sk.compact_sink(spark, land, out, target_rows_per_file=20)
    assert files == 3  # ceil(50 / 20)
    assert len(glob.glob(f"{out}/part-*.parquet")) == 3
    got = spark.read.parquet(out)
    assert sk.PARTITION_COL not in got.columns
    assert {r.id for r in got.collect()} == set(range(50))


def test_sink_rejects_colliding_column(spark, tmp_path):
    from kwack_spark.streaming import sink as sk

    d = spark.range(3).selectExpr("id", f"id AS {sk.PARTITION_COL}")
    import pytest as _pt

    with _pt.raises(ValueError, match="collides"):
        sk.idempotent_batch_writer(str(tmp_path / "land"))(d, 0)


def test_engine_live_topic_durable_restart_no_new_input(spark, tmp_path):
    """Restart against an already-landed dataset with NO new frames: the
    checkpoint replays nothing, so no batch fires the view hook — the table
    must still be registered (eagerly) and show the landed rows.  Also
    covers the empty-topic case: the view resolves before any batch lands."""
    from kwack_spark.config import KwackConfig
    from kwack_spark.engine import KwackSpark

    path = str(tmp_path / "frames")
    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    reg = MockSchemaRegistry()
    sid = reg.register("live_rst-value", json.dumps(AVRO), "AVRO")

    rows = []
    for i in range(4):
        payload = ks.confluent_frame(
            avro_schema.encode({"uid": i, "val": float(i)}, AVRO), sid
        )
        rows.append(
            (None, payload, "live_rst", 0, i,
             TS0 + datetime.timedelta(seconds=i), 0, None)
        )
    spark.createDataFrame(rows, ks.KAFKA_FRAME_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{path}/b1")

    def session():
        eng = KwackSpark(KwackConfig(), spark=spark, registry=reg)
        return eng, eng.register_live_topic(
            "live_rst",
            value_serde=Serde(kind="latest"),
            frames_dir=f"{path}/*",
            durable_path=land,
            checkpoint=ckpt,
        )

    eng, q = session()
    try:
        q.processAllAvailable()
        assert eng.sql("SELECT count(*) AS n FROM live_rst").collect()[0].n == 4
    finally:
        q.stop()

    # "restart": fresh engine, same durable_path/checkpoint, no new frames.
    # The table must be queryable IMMEDIATELY (eager registration), before
    # any micro-batch — the hook never fires because nothing is replayed.
    eng2, q2 = session()
    try:
        assert eng2.sql("SELECT count(*) AS n FROM live_rst").collect()[0].n == 4
        q2.processAllAvailable()
        assert eng2.sql("SELECT max(uid) AS mx FROM live_rst").collect()[0].mx == 3
    finally:
        q2.stop()


def test_compact_sink_rejects_in_place_and_nested(spark, tmp_path):
    """Never compact in place: out_path equal to, inside, or containing
    base_path is a usage error caught before any write."""
    import pytest as _pt

    from kwack_spark.streaming import sink as sk

    land = str(tmp_path / "land")
    sk.idempotent_batch_writer(land)(spark.range(5).selectExpr("id"), 0)

    for bad in (land, land + "/", f"{land}/sub", str(tmp_path)):
        with _pt.raises(ValueError, match="overlaps"):
            sk.compact_sink(spark, land, bad, target_rows_per_file=10)
    # URI-style paths are compared too
    with _pt.raises(ValueError, match="overlaps"):
        sk.compact_sink(spark, "hdfs://nn/sink", "hdfs://nn/sink/out")
    # and the original batch dirs are untouched
    assert spark.read.parquet(land).count() == 5


def test_compact_sink_plans_from_footers_without_count(spark, tmp_path, monkeypatch):
    """Sizing is metadata-only: the plan comes from parquet footers, so the
    one and only data pass is the rewrite itself.  count() is poisoned to
    prove the planner never scans."""
    import glob

    from pyspark.sql import DataFrame

    from kwack_spark.streaming import sink as sk

    land = str(tmp_path / "land")
    out = str(tmp_path / "compacted")
    write = sk.idempotent_batch_writer(land)
    for b in range(4):
        write(spark.range(b * 10, b * 10 + 10).selectExpr("id"), b)

    assert sk._footer_row_count(land) == 40

    def boom(self):
        raise AssertionError("compact_sink planning must not run a count() data pass")

    monkeypatch.setattr(DataFrame, "count", boom)
    files = sk.compact_sink(spark, land, out, target_rows_per_file=15)
    monkeypatch.undo()
    assert files == 3  # ceil(40 / 15)
    assert len(glob.glob(f"{out}/part-*.parquet")) == 3
    assert {r.id for r in spark.read.parquet(out).collect()} == set(range(40))


def test_footer_row_count_falls_back_on_remote_paths():
    from kwack_spark.streaming import sink as sk

    assert sk._footer_row_count("hdfs://nn/some/sink") is None
    assert sk._footer_row_count("/definitely/not/a/real/dir") is None


def test_memory_sink_processing_time_cadence(spark, tmp_path):
    """continuous + processing_time fires on a fixed cadence — the required
    configuration for TTL'd stateful jobs (an armed processing-time timeout
    makes the ASAP trigger busy-loop empty timer batches and blocks
    processAllAvailable forever; see to_memory_sink's docstring)."""
    import uuid

    from kwack_spark.streaming import ingest as si

    path = str(tmp_path / "in")
    spark.range(5).selectExpr("id").write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema("id long").parquet(path)
    sink = f"cadence_{uuid.uuid4().hex[:6]}"
    q = si.to_memory_sink(
        stream, sink, continuous=True, processing_time="100 milliseconds"
    )
    try:
        q.processAllAvailable()  # no state timers here, so this terminates
        assert spark.table(sink).count() == 5
    finally:
        q.stop()


def test_manifest_sink_snapshot_isolation_and_vacuum(spark, tmp_path):
    """The manifest sink's whole point: a replayed batch never disturbs a
    reader holding the previous snapshot, and vacuum reclaims exactly the
    unreferenced attempts."""
    import glob

    from kwack_spark.streaming import sink as sk

    base = str(tmp_path / "mland")
    import os

    os.makedirs(base)
    write = sk.manifest_batch_writer(base)
    write(spark.range(0, 10).selectExpr("id"), 0)
    write(spark.range(10, 20).selectExpr("id"), 1)

    snap1 = sk.read_manifest(base)
    assert set(snap1) == {"0", "1"}
    assert {r.id for r in sk.read_sink_snapshot(spark, base).collect()} == set(range(20))

    # crash-replay of batch 1 with (recomputed) different rows: new attempt,
    # manifest repoints, the OLD snapshot still reads the OLD files intact
    write(spark.range(100, 110).selectExpr("id"), 1)
    new = {r.id for r in sk.read_sink_snapshot(spark, base).collect()}
    assert new == set(range(10)) | set(range(100, 110))
    old = {r.id for r in sk.read_sink_snapshot(spark, base, manifest=snap1).collect()}
    assert old == set(range(20))  # time travel across the replay

    # a crash orphan (attempt written, manifest never updated) is invisible
    orphan = f"{base}/_attempts/batch=2/attempt=deadbeef"
    spark.range(500, 505).selectExpr("id").write.parquet(orphan)
    assert {r.id for r in sk.read_sink_snapshot(spark, base).collect()} == new

    # vacuum removes the superseded batch-1 attempt and the orphan, keeps
    # everything the current manifest references
    assert sk.vacuum_sink(base) == 2
    assert {r.id for r in sk.read_sink_snapshot(spark, base).collect()} == new
    assert len(glob.glob(f"{base}/_attempts/batch=*/attempt=*")) == 2


def test_manifest_sink_streaming_end_to_end(spark, tmp_path):
    """to_manifest_parquet_sink drains a bounded replay exactly-once and the
    snapshot read equals the input."""
    from kwack_spark.streaming import sink as sk

    src = str(tmp_path / "src")
    spark.range(50).selectExpr("id", "id % 5 AS grp").repartition(3).write.parquet(src)
    base, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("id long, grp long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = sk.to_manifest_parquet_sink(stream, base, ckpt)
    assert q.awaitTermination(300)
    got = sk.read_sink_snapshot(spark, base)
    assert got.count() == 50 and {r.id for r in got.collect()} == set(range(50))
    assert len(sk.read_manifest(base)) >= 2  # multiple micro-batches committed


def test_vacuum_sink_path_spelling_does_not_delete_live_data(spark, tmp_path):
    """vacuum decides liveness on (batch, attempt) NAME pairs, so calling it
    with a differently-spelled but equivalent base_path (trailing slash,
    relative, symlink alias) must reclaim only true orphans — never the
    attempts the manifest references."""
    import os

    from kwack_spark.streaming import sink as sk

    base = str(tmp_path / "mland")
    os.makedirs(base)
    write = sk.manifest_batch_writer(base)
    write(spark.range(0, 10).selectExpr("id"), 0)
    spark.range(99, 102).selectExpr("id").write.parquet(
        f"{base}/_attempts/batch=7/attempt=orphan01"
    )

    # trailing slash
    assert sk.vacuum_sink(base + "/") == 1
    assert {r.id for r in sk.read_sink_snapshot(spark, base).collect()} == set(range(10))

    # symlinked alias of the same directory
    alias = str(tmp_path / "alias")
    os.symlink(base, alias)
    spark.range(200, 203).selectExpr("id").write.parquet(
        f"{base}/_attempts/batch=8/attempt=orphan02"
    )
    assert sk.vacuum_sink(alias) == 1
    assert {r.id for r in sk.read_sink_snapshot(spark, base).collect()} == set(range(10))


def test_manifest_writer_lock_fails_loudly_on_contention(spark, tmp_path):
    """A concurrent (or crashed) writer's lock file makes the next commit
    raise instead of silently losing an update; the lock is released on
    successful commit."""
    import os

    import pytest

    from kwack_spark.streaming import sink as sk

    base = str(tmp_path / "mland")
    os.makedirs(base)
    write = sk.manifest_batch_writer(base)
    write(spark.range(0, 5).selectExpr("id"), 0)
    lock = os.path.join(base, f".{sk.MANIFEST_NAME}.lock")
    assert not os.path.exists(lock)  # released after commit

    open(lock, "w").close()  # simulate a concurrent writer holding it
    with pytest.raises(RuntimeError, match="locked by a concurrent writer"):
        write(spark.range(5, 10).selectExpr("id"), 1)
    os.unlink(lock)
    write(spark.range(5, 10).selectExpr("id"), 1)  # recovers after release
    assert set(sk.read_manifest(base)) == {"0", "1"}


def test_compact_sink_rejects_file_uri_alias_of_same_path(spark, tmp_path):
    """file:// URIs and bare local paths are one namespace for the
    in-place/nested compaction guard."""
    import pytest

    from kwack_spark.streaming import sink as sk

    land = str(tmp_path / "land")
    for bad_base, bad_out in [
        (f"file://{land}", f"{land}/out"),
        (land, f"file://{land}/out"),
        (f"file://{land}", land),
    ]:
        with pytest.raises(ValueError, match="overlaps"):
            sk._check_disjoint_paths(bad_base, bad_out)
    sk._check_disjoint_paths(f"file://{land}", str(tmp_path / "elsewhere"))


def test_compact_sink_guard_handles_uri_authority_and_single_slash(spark, tmp_path):
    """All JVM-accepted file-URI spellings normalize to the same local path
    for the overlap guard: file:/x (single slash), file:///x, and
    file://localhost/x (authority present).  A literal "file://" prefix
    strip used to fuse the authority into the path (r05 ADVICE), making
    file://localhost/x compare as "localhost/x" and miss real overlaps."""
    import pytest

    from kwack_spark.streaming import sink as sk

    land = str(tmp_path / "land")
    for alias in (f"file:{land}", f"file://{land}", f"file://localhost{land}"):
        with pytest.raises(ValueError, match="overlaps"):
            sk._check_disjoint_paths(alias, f"{land}/out")
        with pytest.raises(ValueError, match="overlaps"):
            sk._check_disjoint_paths(land, alias)
    # remote schemes stay textual — no false overlap with a local path of
    # the same spelling, and nested remote paths are still caught
    with pytest.raises(ValueError, match="overlaps"):
        sk._check_disjoint_paths("hdfs://nn/sink", "hdfs://nn/sink/out")
    sk._check_disjoint_paths("hdfs://nn/sink", "hdfs://nn/other")


def test_compact_sink_guard_local_path_with_colon_segment(spark, tmp_path):
    """A relative local path whose first segment contains a colon
    ('run:1/sink') is NOT a remote URI: it must realpath and still catch
    overlaps with its absolute spelling."""
    import os

    import pytest

    from kwack_spark.streaming import sink as sk

    d = tmp_path / "run:1" / "sink"
    d.mkdir(parents=True)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        with pytest.raises(ValueError, match="overlaps"):
            sk._check_disjoint_paths("run:1/sink", str(d / "out"))
    finally:
        os.chdir(cwd)


def test_footer_row_count_accepts_file_uri_spellings(spark, tmp_path):
    """_footer_row_count shares the guard's normalization: file:/x and
    file://localhost/x walk the local directory; remote schemes -> None."""
    from kwack_spark.streaming import sink as sk

    land = tmp_path / "land"
    spark.range(10).coalesce(1).write.parquet(str(land))
    assert sk._footer_row_count(f"file:{land}") == 10
    assert sk._footer_row_count(f"file://localhost{land}") == 10
    assert sk._footer_row_count("hdfs://nn/x") is None


def test_footer_row_count_rejects_remote_file_authority(spark, tmp_path):
    """file://<other-host>/... names another machine's filesystem — the
    footer walk must return None (fallback), not walk a same-named local
    directory; the disjointness guard still compares such URIs textually."""
    import pytest

    from kwack_spark.streaming import sink as sk

    assert sk._footer_row_count("file://nas-host/data") is None
    with pytest.raises(ValueError, match="overlaps"):
        sk._check_disjoint_paths("file://nas-host/data", "file://nas-host/data/out")
