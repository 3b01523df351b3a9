"""Unit tests for the REAL WAV/PCM16 audio kernel
(operators/multimodal.py:decode_wav_features) — chunk walking, stereo,
odd-size padding, and malformed-payload tolerance, beyond what the
closed-form oracle query (multimodal_wav_decode) pins."""

import struct

from kwack_spark.operators import multimodal as mm


def _wav(chunks: bytes) -> bytes:
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _fmt(ch: int, rate: int, bits: int = 16, audio_fmt: int = 1) -> bytes:
    body = struct.pack(
        "<HHIIHH", audio_fmt, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits
    )
    return b"fmt " + struct.pack("<I", len(body)) + body


def _data(samples: list[int]) -> bytes:
    body = b"".join(struct.pack("<h", s) for s in samples)
    return b"data" + struct.pack("<I", len(body)) + body


def _decode(spark, payloads: list[bytes]):
    df = spark.createDataFrame(
        list(enumerate(payloads)), "doc_id long, payload binary"
    )
    return {
        r.doc_id: r for r in mm.decode_wav_features(df, "payload", "doc_id").collect()
    }


def test_wav_roundtrip_and_chunk_walk(spark):
    """Synth fixture decodes to its closed-form features; the junk LIST
    chunk before data forces a real chunk walk."""
    d = spark.createDataFrame([(7,), (1006,)], "doc_id long")
    out = {
        r.doc_id: r
        for r in mm.decode_wav_features(
            mm.synth_wav_pcm16(d, "doc_id"), "payload", "doc_id"
        ).collect()
    }
    assert out[7].rms == 8.0 and out[7].peak == 8  # 7 % 1000 + 1
    assert out[1006].rms == 7.0  # 1006 % 1000 + 1
    assert out[7].sample_rate == 8000 and out[7].n_samples == 1024
    assert out[7].duration_ms == 1024 / 8000 * 1000


def test_wav_stereo_and_odd_chunk_padding(spark):
    """Stereo frames interleave L/R (n_samples is per channel); an odd-size
    chunk is followed by a pad byte the walker must skip."""
    odd = b"LIST" + struct.pack("<I", 3) + b"xyz" + b"\x00"  # 3 bytes + pad
    stereo = _wav(_fmt(2, 16000) + odd + _data([100, -100] * 8))
    out = _decode(spark, [stereo])
    r = out[0]
    assert r.n_channels == 2 and r.sample_rate == 16000
    assert r.n_samples == 8  # 16 int16 values / 2 channels
    assert r.rms == 100.0 and r.peak == 100


def test_wav_malformed_yields_nulls_not_failure(spark):
    """Garbage, non-PCM, and truncated payloads produce NULL features in
    the same batch as a good file — one poison blob must not kill the job."""
    good = _wav(_fmt(1, 8000) + _data([5, -5, 5, -5]))
    not_riff = b"\x89PNG" + b"\x00" * 40
    no_data = _wav(_fmt(1, 8000))
    compressed = _wav(_fmt(1, 8000, audio_fmt=85) + _data([1, 2]))
    out = _decode(spark, [good, not_riff, no_data, compressed])
    assert out[0].rms == 5.0 and out[0].n_samples == 4
    for bad in (1, 2, 3):
        assert out[bad].rms is None and out[bad].sample_rate is None
