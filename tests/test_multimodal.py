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


def test_png_roundtrip_all_filters(spark):
    """The fixture encoder cycles filter types y%5; decode must reproduce
    the exact pixel matrix for gray and RGB, single and split IDAT."""
    import numpy as np

    from kwack_spark.operators.multimodal import _png_decode, _png_encode

    rng = np.random.RandomState(11)
    for (h, w, ch) in [(16, 16, 3), (16, 6, 3), (8, 16, 1), (1, 1, 1), (7, 3, 1)]:
        px = rng.randint(0, 256, size=(h, w * ch)).astype(np.int32)
        for split in (False, True):
            out = _png_decode(_png_encode(px, ch, split_idat=split))
            assert out is not None
            W, H, C, D, recon = out
            assert (W, H, C, D) == (w, h, ch, 8)
            assert np.array_equal(recon, px.astype(np.uint8))


def test_png_malformed_yields_nulls_not_failure(spark):
    """Bad signature, truncation, and CRC corruption all yield NULL
    features (the on_error='skip' analogue), never a batch failure."""
    import numpy as np

    from kwack_spark.operators import multimodal as mm

    good = mm._png_encode(
        np.random.RandomState(0).randint(0, 256, (4, 12)).astype(np.int32), 3
    )
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF
    d = spark.createDataFrame(
        [(0, good), (1, b"not a png"), (2, good[:20]), (3, bytes(bad_crc))],
        "doc_id long, payload binary",
    )
    rows = sorted(
        mm.decode_png_features(d, "payload", "doc_id").collect(),
        key=lambda r: r.doc_id,
    )
    assert rows[0].width == 4 and rows[0].channels == 3
    for bad in (1, 2, 3):
        assert rows[bad].width is None and rows[bad].mean_r is None


def test_decode_image_real_png_and_sniffed_other_formats(spark):
    """decode_image (the former stub slot) really decodes PNG and tags
    undecodable formats with NULL dims instead of raising."""
    import numpy as np

    from kwack_spark.operators import multimodal as mm

    import struct

    png = mm._png_encode(np.full((5, 6), 9, np.int32), 1)
    # minimal JPEG header: SOI, APP0, DQT (arbitrary body), SOF0 (8-bit,
    # 480x640, 3 components), EOI — dimension parse walks the markers and
    # never touches entropy-coded data
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    dqt = b"\xff\xdb" + struct.pack(">H", 5) + b"\x00\x01\x02"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(
        ">BHHB", 8, 480, 640, 3
    ) + b"\x01\x11\x00"
    jpeg = b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"
    d = spark.createDataFrame(
        [
            (0, png),
            (1, jpeg),
            (2, b"RIFFxxxxWAVE"),
            (3, b"??"),
            (4, b"\xff\xd8\xff\xe0junk"),  # truncated jpeg -> NULL dims
        ],
        "doc_id long, payload binary",
    )
    rows = sorted(
        mm.decode_image(d, "payload", "doc_id").collect(), key=lambda r: r.doc_id
    )
    assert (rows[0].width, rows[0].height, rows[0].channels, rows[0].format) == (6, 5, 1, "png")
    assert (rows[1].width, rows[1].height, rows[1].channels, rows[1].format) == (640, 480, 3, "jpeg")
    assert rows[2].format == "riff" and rows[3].format == "unknown"
    assert rows[4].format == "jpeg" and rows[4].width is None
