"""Multimodal (image/audio/video) column plumbing.

Beyond-parity operators for a training-data pipeline: media are opaque
``binary`` payload columns with typed metadata, processed by Arrow-batched
mapInPandas stages.  The decode kernels themselves are STUBS — the container
has no image/audio libraries — but everything Spark-side is real and tested:
schemas, batch shapes, partitioning, UDF signatures.

Two kernel modes:
- ``decode_image`` raises NotImplementedError (clearly marked): swap in a
  real PIL/ffmpeg kernel at deployment.
- ``fake_decode_image`` is a DETERMINISTIC arithmetic stand-in (reads
  width/height/channels from the payload's leading bytes) used by tests and
  the oracle corpus — its math is reproducible in SQL, so the full
  mapInPandas pipeline is hash-checked against DuckDB.

Scale shape: decode is a narrow per-partition pass; payload columns are
hundreds of KB each, so stages that follow repartition by a small metadata
projection rather than shuffling payloads.  ``drop_payload_early`` is the
pattern: project metadata/features first, never shuffle raw bytes.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as ST

IMAGE_META_SCHEMA = ST.StructType(
    [
        ST.StructField("width", ST.IntegerType(), True),
        ST.StructField("height", ST.IntegerType(), True),
        ST.StructField("channels", ST.IntegerType(), True),
        ST.StructField("format", ST.StringType(), True),
    ]
)


def attach_binary_metadata(df: DataFrame, payload_col: str) -> DataFrame:
    """Typed metadata over an opaque binary column — JVM-side only (size,
    content hash, magic-byte format sniff); no Python in the path."""
    p = F.col(payload_col)
    head = F.hex(F.substring(p, 1, 4))
    fmt = (
        F.when(head.startswith("89504E47"), "png")
        .when(head.startswith("FFD8FF"), "jpeg")
        .when(head.startswith("52494646"), "riff")
        .otherwise("unknown")
    )
    return df.withColumns(
        {
            "media_bytes": F.length(p),
            "media_md5": F.md5(p),
            "media_format": fmt,
        }
    )


def decode_image(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """REAL-KERNEL SLOT — image decode requires an imaging library that is
    not in this container.  The Spark plumbing (signature, schema, batching)
    is identical to fake_decode_image; only the kernel differs."""

    def kernel(batches):
        raise NotImplementedError(
            "image decode kernel: install an imaging library (e.g. PIL) and "
            "replace this body with Image.open(io.BytesIO(payload)); the "
            "fake_decode_image pipeline is the tested stand-in"
        )

    out_schema = ST.StructType(
        [ST.StructField(id_col, ST.LongType())] + list(IMAGE_META_SCHEMA.fields)
    )
    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def fake_decode_image(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Deterministic decode stand-in: width/height/channels derived from the
    payload's first bytes (b0*256+b1, b2*256+b3, 1+b4%4).  Arithmetic only —
    reproducible in any engine, so the pipeline is oracle-checkable."""

    def kernel(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                payload = bytes(getattr(rec, payload_col))
                b = payload[:5].ljust(5, b"\x00")
                rows.append(
                    {
                        id_col: getattr(rec, id_col),
                        "width": b[0] * 256 + b[1],
                        "height": b[2] * 256 + b[3],
                        "channels": 1 + b[4] % 4,
                        "format": "fake",
                    }
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "channels", "format"]
            )

    out_schema = ST.StructType(
        [ST.StructField(id_col, ST.LongType())] + list(IMAGE_META_SCHEMA.fields)
    )
    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def sample_frames(
    df: DataFrame, payload_col: str, id_col: str, frame_size: int = 16, every_n: int = 4
) -> DataFrame:
    """Video-style frame sampling plumbing: split the payload into fixed-size
    chunks, keep every Nth — one row per sampled frame (posexplode).  All
    JVM-side: no Python, no shuffle; the explode multiplies rows locally."""
    p = F.col(payload_col)
    n_frames = F.floor(F.length(p) / F.lit(frame_size)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    sampled = F.filter(idx, lambda i: i % every_n == 0)
    frames = F.transform(
        sampled, lambda i: F.struct(
            i.alias("frame_no"),
            F.substring(p, i * frame_size + 1, frame_size).alias("frame"),
        )
    )
    return (
        df.select(id_col, F.explode(frames).alias("f"))
        .select(
            id_col,
            F.col("f.frame_no").alias("frame_no"),
            F.col("f.frame").alias("frame"),
            F.md5(F.col("f.frame")).alias("frame_md5"),
        )
    )


def resize_bytes(
    df: DataFrame, payload_col: str, id_col: str, target: int = 32
) -> DataFrame:
    """Deterministic resize stand-in: nearest-neighbor byte resample of the
    payload to exactly ``target`` bytes (out[i] = in[(i*n)//target]).  A real
    image resize swaps only the kernel body (PIL thumbnail etc.); the Spark
    shape — vectorized numpy over Arrow batches, narrow, no payload shuffle —
    is what this pins down.  Output: (id, orig_len, resized binary)."""
    import numpy as np
    import pandas as pd

    def kernel(batches) -> Iterator:
        for pdf in batches:
            ids, lens, outs = [], [], []
            for rec in pdf.itertuples(index=False):
                payload = bytes(getattr(rec, payload_col))
                n = len(payload)
                if n == 0:
                    out = b""
                else:
                    arr = np.frombuffer(payload, dtype=np.uint8)
                    idx = (np.arange(target, dtype=np.int64) * n) // target
                    out = arr[idx].tobytes()
                ids.append(getattr(rec, id_col))
                lens.append(n)
                outs.append(out)
            yield pd.DataFrame({id_col: ids, "orig_len": lens, "resized": outs})

    out_schema = ST.StructType(
        [
            ST.StructField(id_col, ST.LongType()),
            ST.StructField("orig_len", ST.LongType()),
            ST.StructField("resized", ST.BinaryType()),
        ]
    )
    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def byte_histogram_features(
    df: DataFrame, payload_col: str, id_col: str, bins: int = 16
) -> DataFrame:
    """Feature extraction over an opaque payload: byte count, mean byte value,
    and a ``bins``-bin histogram of the high nibble-scaled byte range,
    JSON-encoded so the feature vector stays hashable downstream.  Vectorized
    numpy (np.bincount) per Arrow batch — the stand-in for an embedding or
    perceptual-feature kernel with the same narrow plan shape."""
    import numpy as np
    import pandas as pd

    width = 256 // bins

    def kernel(batches) -> Iterator:
        for pdf in batches:
            ids, nb, mean, hist = [], [], [], []
            for rec in pdf.itertuples(index=False):
                payload = bytes(getattr(rec, payload_col))
                arr = np.frombuffer(payload, dtype=np.uint8)
                n = len(arr)
                ids.append(getattr(rec, id_col))
                nb.append(n)
                mean.append(float(int(arr.sum(dtype=np.int64))) / n if n else 0.0)
                counts = np.bincount(arr // width, minlength=bins)[:bins]
                hist.append("[" + ",".join(str(int(c)) for c in counts) + "]")
            yield pd.DataFrame(
                {id_col: ids, "n_bytes": nb, "mean_byte": mean, "hist": hist}
            )

    out_schema = ST.StructType(
        [
            ST.StructField(id_col, ST.LongType()),
            ST.StructField("n_bytes", ST.LongType()),
            ST.StructField("mean_byte", ST.DoubleType()),
            ST.StructField("hist", ST.StringType()),
        ]
    )
    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


WAV_FEATURES_SCHEMA = ST.StructType(
    [
        ST.StructField("sample_rate", ST.IntegerType(), True),
        ST.StructField("n_channels", ST.IntegerType(), True),
        ST.StructField("n_samples", ST.LongType(), True),
        ST.StructField("duration_ms", ST.DoubleType(), True),
        ST.StructField("rms", ST.DoubleType(), True),
        ST.StructField("peak", ST.IntegerType(), True),
    ]
)


def synth_wav_pcm16(
    df: DataFrame,
    id_col: str,
    n_samples: int = 1024,
    rate: int = 8000,
) -> DataFrame:
    """Deterministic RIFF/WAVE PCM16 fixture generator (pure ``struct`` —
    no audio library): mono square wave alternating ±amplitude with
    amplitude = id % 1000 + 1, plus a junk LIST chunk before ``data`` so a
    consumer must actually walk the chunk structure.  Output: (id, payload
    binary).  Exists so the REAL wav decode kernel below can be exercised
    end-to-end in environments with no media files."""
    import struct

    import pandas as pd

    def kernel(batches) -> Iterator:
        for pdf in batches:
            ids, outs = [], []
            for rec in pdf.itertuples(index=False):
                i = int(getattr(rec, id_col))
                amp = i % 1000 + 1
                frames = b"".join(
                    struct.pack("<h", amp if k % 2 == 0 else -amp)
                    for k in range(n_samples)
                )
                fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
                junk = b"JUNKJUNK"  # LIST chunk body a parser must skip
                chunks = (
                    b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"LIST" + struct.pack("<I", len(junk)) + junk
                    + b"data" + struct.pack("<I", len(frames)) + frames
                )
                payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
                ids.append(i)
                outs.append(payload)
            yield pd.DataFrame({id_col: ids, "payload": outs})

    out_schema = ST.StructType(
        [
            ST.StructField(id_col, ST.LongType()),
            ST.StructField("payload", ST.BinaryType()),
        ]
    )
    return df.select(id_col).mapInPandas(kernel, out_schema)


def decode_wav_features(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """REAL audio decode kernel — not a stub: RIFF/WAVE PCM16 parsing is
    pure byte arithmetic (struct + numpy), so unlike image decode it needs
    no external library.  Walks the chunk list (skipping unknown chunks,
    honoring the odd-size pad byte), reads fmt (PCM, channels, rate, 16
    bit), decodes ``data`` as int16, and emits per-file audio features:
    sample_rate, n_channels, n_samples (per channel), duration_ms, RMS,
    peak.  Malformed payloads yield NULL features instead of failing the
    batch (the multimodal analogue of decode_topic's on_error='skip').
    Same narrow Arrow-batched plan shape as every kernel in this module."""
    import struct

    import numpy as np
    import pandas as pd

    def parse(payload: bytes):
        if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        pos, fmt_info, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body = payload[pos + 8:pos + 8 + size]
            if cid == b"fmt " and size >= 16:
                audio_fmt, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body)
                fmt_info = (audio_fmt, ch, rate, bits)
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # odd chunk sizes are padded
        if fmt_info is None or data is None:
            return None
        audio_fmt, ch, rate, bits = fmt_info
        if audio_fmt != 1 or bits != 16 or ch < 1:
            return None  # only uncompressed PCM16 here
        s = np.frombuffer(data[: (len(data) // (2 * ch)) * 2 * ch], dtype="<i2")
        n = len(s) // ch
        x = s.astype(np.float64)
        rms = float(np.sqrt(np.mean(x * x))) if len(s) else 0.0
        peak = int(np.max(np.abs(x))) if len(s) else 0
        return (rate, ch, n, float(n) / rate * 1000.0, rms, peak)

    def kernel(batches) -> Iterator:
        cols = [id_col] + [f.name for f in WAV_FEATURES_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                parsed = parse(bytes(getattr(rec, payload_col)))
                vals = parsed if parsed is not None else (None,) * 6
                rows.append((getattr(rec, id_col),) + vals)
            yield pd.DataFrame(rows, columns=cols)

    out_schema = ST.StructType(
        [ST.StructField(id_col, ST.LongType())] + list(WAV_FEATURES_SCHEMA.fields)
    )
    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def drop_payload_early(df: DataFrame, payload_col: str, feature_cols: list[str]) -> DataFrame:
    """The shuffle-hygiene pattern: project features and DROP the payload
    before any wide operation, so raw bytes never cross the network."""
    keep = [c for c in feature_cols if c != payload_col]
    return df.select(*keep)
