"""Round-6 wave 11-19 operator pins.

- wav_rms_windows: closed-form per-window RMS/peak on the stepped fixture;
  malformed / truncated / non-PCM payloads degrade to zero rows instead of
  failing the Arrow batch.
- incremental_simhash_new_dups: a verbatim batch copy of a history doc
  must collide at hamming 0; the pigeonhole precondition is enforced.
- stateful_cusum_days: a 2-micro-batch replay's final state must decode to
  the hand-computed scaled-integer CUSUM argmax regardless of which batch
  carried which rows.
"""

import struct

import pyspark.sql.functions as F

from kwack_spark.operators import dedup, multimodal as mm


def test_wav_rms_windows_closed_form(spark):
    ids = spark.createDataFrame([(3,), (510,)], "doc_id long")
    wav = mm.synth_wav_stepped(ids, "doc_id")
    rows = mm.wav_rms_windows(wav, "payload", "doc_id").collect()
    assert len(rows) == 16  # 2 docs x 8 windows
    for r in rows:
        base = r.doc_id % 500 + 1
        assert r.n_samples == 128
        assert r.rms == float(base + r.window_id)
        assert r.peak == base + r.window_id


def test_wav_rms_windows_malformed_payloads(spark):
    good = mm.synth_wav_stepped(
        spark.createDataFrame([(1,)], "doc_id long"), "doc_id"
    ).collect()[0].payload
    bad = [
        (1, b"not a riff"),
        (2, b"RIFF\x00\x00\x00\x00WAVE"),          # no chunks at all
        (3, bytes(good)[:40]),                      # truncated mid-fmt
        # fmt claims float (audio_fmt=3), parser must skip the file
        (4, b"RIFF" + struct.pack("<I", 28) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", 0)),
        (5, bytes(good)),                           # control: decodes
    ]
    df = spark.createDataFrame(bad, "doc_id long, payload binary")
    out = mm.wav_rms_windows(df, "payload", "doc_id")
    got = {r.doc_id for r in out.collect()}
    assert got == {5}


def test_incremental_simhash_verbatim_copy(spark):
    hist = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (101, "completely different words about ships and harbors then"),
        ],
        "doc_id long, text string",
    )
    out = dedup.incremental_simhash_new_dups(
        hist, batch, "doc_id", "text", bits=32, max_hamming=3, blocks=4
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert 100 in by_id and by_id[100].hist_id == 1 and by_id[100].hamming == 0


def test_incremental_simhash_pigeonhole_precondition(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    try:
        dedup.incremental_simhash_new_dups(
            df, df, "doc_id", "text", bits=32, max_hamming=4, blocks=4
        )
        raise AssertionError("expected ValueError")
    except ValueError as exc:
        assert "pigeonhole" in str(exc)


def test_stateful_cusum_days_matches_hand_computation(spark, tmp_path):
    import pandas as pd

    from kwack_spark.streaming import ingest as si

    # one key, 4 days with counts 1/1/3/3 -> total 8, n_days 4;
    # scaled CUSUM s_k = 4*cum_k - k*8: [-4, -8, -4, 0] -> unique argmax
    # |s| at day 2
    rows = []
    counts = {1: 1, 2: 1, 3: 3, 4: 3}
    for day, c in counts.items():
        for i in range(c):
            rows.append(("k", f"2024-01-0{day} 0{i}:00:00"))
    df = spark.createDataFrame(rows, "event_type string, ts string").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    replay = str(tmp_path / "replay")
    df.repartition(2).write.mode("overwrite").parquet(replay)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    states = si.stateful_cusum_days(stream, "event_type", "ts")
    q = (
        states.writeStream.format("memory")
        .queryName("cusum_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    final = (
        spark.table("cusum_test")
        .orderBy(F.desc("total"))
        .limit(1)
        .collect()[0]
    )
    assert final.total == 8
    assert final.n_days == 4
    epoch_day2 = (pd.Timestamp("2024-01-02").date() - pd.Timestamp("1970-01-01").date()).days
    assert final.change_day_ord == epoch_day2
    assert final.s_scaled == -8
