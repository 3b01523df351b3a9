"""Multimodal (image/audio/video) column plumbing.

Beyond-parity operators for a training-data pipeline: media are opaque
``binary`` payload columns with typed metadata, processed by Arrow-batched
mapInPandas stages.  The container has no media libraries, but two decode
kernels are REAL anyway because their formats are pure byte arithmetic +
stdlib compression: WAV/PCM16 (``decode_wav_features``) and PNG
(``decode_png_features`` / ``decode_image`` — zlib inflate, CRC-checked
chunk walk, all five scanline unfilters).  Formats that genuinely need a
codec library (JPEG's DCT, video) are sniffed and emit NULL features with
the format tag, never silently-wrong values.

Kernel tiers:
- ``decode_png_features`` / ``decode_wav_features``: real decoders,
  oracle-checked end-to-end on closed-form fixtures.
- ``decode_image``: real for PNG; magic-sniff + NULL dims otherwise.
- ``fake_decode_image``: a DETERMINISTIC arithmetic stand-in (reads
  width/height/channels from the payload's leading bytes) whose math is
  reproducible in SQL, kept for hash-checking the pipeline shape against
  DuckDB independently of any format.

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


def _jpeg_dimensions(payload: bytes):
    """Width/height/channels from a JPEG's SOF marker — header arithmetic
    only, no DCT decode needed (pixel decode DOES need a codec library,
    which this container lacks).  Walks the marker stream (each non-RST
    marker carries a big-endian length), stopping at the first SOFn
    (C0-CF except C4/C8/CC, which are DHT/JPG/DAC).  Returns
    (width, height, channels) or None for malformed streams."""
    import struct

    if payload[:3] != b"\xff\xd8\xff":
        return None
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM/RSTn: no segment body
            pos += 2
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        if seg_len < 2 or pos + 2 + seg_len > len(payload):
            return None
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if seg_len < 8:
                return None
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, pos + 4)
            return (w, h, ncomp)
        pos += 2 + seg_len
    return None


def decode_image(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """REAL image metadata decode (no library needed): PNG payloads are
    fully decoded by the stdlib kernel below (``_png_decode`` — chunk walk,
    CRC, inflate, unfilter) and JPEG payloads report true dimensions from
    their SOF frame header (``_jpeg_dimensions`` — marker-stream walk, no
    DCT); remaining formats are sniffed by magic bytes and emit NULL
    dimensions with the format tag — rows are never silently wrong, just
    explicitly undecoded.  For the full per-channel feature pass over PNGs
    use ``decode_png_features``."""

    def kernel(batches) -> Iterator:
        import pandas as pd

        cols = [id_col, "width", "height", "channels", "format"]
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                payload = bytes(getattr(rec, payload_col))
                if payload.startswith(_PNG_SIG):
                    parsed = _png_decode(payload)
                    vals = (
                        (parsed[0], parsed[1], parsed[2], "png")
                        if parsed is not None
                        else (None, None, None, "png")
                    )
                elif payload[:3] == b"\xff\xd8\xff":
                    dims = _jpeg_dimensions(payload)
                    vals = (
                        (dims[0], dims[1], dims[2], "jpeg")
                        if dims is not None
                        else (None, None, None, "jpeg")
                    )
                elif payload[:4] == b"RIFF":
                    vals = (None, None, None, "riff")
                else:
                    vals = (None, None, None, "unknown")
                rows.append((getattr(rec, id_col),) + vals)
            yield pd.DataFrame(rows, columns=cols)

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


PNG_FEATURES_SCHEMA = ST.StructType(
    [
        ST.StructField("width", ST.IntegerType(), True),
        ST.StructField("height", ST.IntegerType(), True),
        ST.StructField("channels", ST.IntegerType(), True),
        ST.StructField("bit_depth", ST.IntegerType(), True),
        ST.StructField("mean_r", ST.DoubleType(), True),
        ST.StructField("mean_g", ST.DoubleType(), True),
        ST.StructField("mean_b", ST.DoubleType(), True),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_filter_row(cur, prev, left_pad, ftype):
    """Apply PNG filter ``ftype`` to reconstructed row ``cur`` (int32 numpy,
    length w*bpp) given the prior reconstructed row — encoder side.  Filters
    reference RECONSTRUCTED bytes, so each row vectorizes fully."""
    import numpy as np

    left = np.concatenate([np.zeros(left_pad, np.int32), cur[:-left_pad]])
    upleft = np.concatenate([np.zeros(left_pad, np.int32), prev[:-left_pad]])
    if ftype == 0:
        return cur % 256
    if ftype == 1:
        return (cur - left) % 256
    if ftype == 2:
        return (cur - prev) % 256
    if ftype == 3:
        return (cur - (left + prev) // 2) % 256
    # Paeth
    p = left + prev - upleft
    pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
    pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
    return (cur - pred) % 256


def _png_encode(pixels, channels: int, split_idat: bool = False) -> bytes:
    """Minimal, standards-correct PNG writer (stdlib zlib/struct + numpy):
    8-bit gray (color 0) or RGB (color 2), no interlace.  ``pixels``:
    (h, w*channels) int array of reconstructed samples.  Filter type cycles
    ``y % 5`` per scanline so every unfilter branch in the decoder is
    exercised by fixtures, and ``split_idat`` emits two IDAT chunks (the
    spec allows any split; decoders must concatenate)."""
    import struct
    import zlib

    import numpy as np

    h, stride = pixels.shape
    w = stride // channels
    color = {1: 0, 3: 2}[channels]
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur = pixels[y].astype(np.int32)
        f = y % 5
        raw.append(f)
        raw.extend(_png_filter_row(cur, prev, channels, f).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    z = zlib.compress(bytes(raw), 6)
    if split_idat and len(z) > 2:
        mid = len(z) // 2
        idat = _png_chunk(b"IDAT", z[:mid]) + _png_chunk(b"IDAT", z[mid:])
    else:
        idat = _png_chunk(b"IDAT", z)
    return _PNG_SIG + _png_chunk(b"IHDR", ihdr) + idat + _png_chunk(b"IEND", b"")


def _png_decode(payload: bytes):
    """Minimal, standards-correct PNG reader (stdlib zlib/struct + numpy):
    signature, chunk walk with CRC verification, multi-IDAT concatenation,
    inflate, and per-scanline unfilter (None/Sub/Up/Average/Paeth) for
    8-bit gray/gray+alpha/RGB/RGBA.  Returns (w, h, channels, depth,
    pixel matrix (h, w*channels) uint8) or None for anything malformed or
    out of scope (16-bit, palette, interlaced)."""
    import struct
    import zlib

    import numpy as np

    if not payload.startswith(_PNG_SIG):
        return None
    pos, ihdr, idat, ended = len(_PNG_SIG), None, bytearray(), False
    while pos + 12 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + size]
        if len(data) < size or pos + 12 + size > len(payload):
            return None
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + size)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            return None
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            ended = True
            break
        pos += 12 + size
    if ihdr is None or not idat or not ended:
        return None
    w, h, depth, color, comp, filt, interlace = ihdr
    channels = _PNG_CHANNELS.get(color)
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or channels is None:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) != h * (stride + 1):
        return None
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes, data = arr[:, 0], arr[:, 1:].astype(np.int32)
    recon = np.zeros((h, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    bpp = channels
    for y in range(h):
        f, line = int(ftypes[y]), data[y]
        if f == 0:
            cur = line
        elif f == 1:  # Sub: per-lane cumulative sum (mod distributes)
            cur = np.cumsum(line.reshape(w, bpp), axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            cur = (line + prev) % 256
        elif f == 3:  # Average: sequential in x, vectorized over the pixel
            cur = np.empty(stride, np.int32)
            for x in range(w):
                s = slice(x * bpp, (x + 1) * bpp)
                left = cur[(x - 1) * bpp:x * bpp] if x else np.zeros(bpp, np.int32)
                cur[s] = (line[s] + (left + prev[s]) // 2) % 256
        elif f == 4:  # Paeth
            cur = np.empty(stride, np.int32)
            for x in range(w):
                s = slice(x * bpp, (x + 1) * bpp)
                a = cur[(x - 1) * bpp:x * bpp] if x else np.zeros(bpp, np.int32)
                b = prev[s]
                c = prev[(x - 1) * bpp:x * bpp] if x else np.zeros(bpp, np.int32)
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                cur[s] = (line[s] + pred) % 256
        else:
            return None
        recon[y] = cur
        prev = cur
    return w, h, channels, depth, recon.astype(np.uint8)


def synth_png(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic PNG fixture generator (real encoder, stdlib only).
    Per id d: width 16 (d even) / 6 (odd); height 8 (d%3==0) / 16;
    grayscale when d%7==0 else RGB; two IDAT chunks when d%11==0.  Pixel
    pattern has CLOSED-FORM channel means (see multimodal_png_decode's
    oracle): R = d%256 constant, G = x*255//(w-1) (mean exactly 127.5 for
    both widths), B = y*255//(h-1) (127.5 at h=16, 127.125 at h=8); gray
    images are the constant d%256.  Filter type cycles y%5, so decoding
    exercises every unfilter branch."""
    import numpy as np
    import pandas as pd

    def kernel(batches) -> Iterator:
        for pdf in batches:
            ids, outs = [], []
            for rec in pdf.itertuples(index=False):
                d = int(getattr(rec, id_col))
                w = 16 if d % 2 == 0 else 6
                h = 8 if d % 3 == 0 else 16
                if d % 7 == 0:
                    px = np.full((h, w), d % 256, np.int32)
                    ch = 1
                else:
                    ch = 3
                    px = np.zeros((h, w * 3), np.int32)
                    px[:, 0::3] = d % 256
                    px[:, 1::3] = (np.arange(w) * 255) // (w - 1)
                    px[:, 2::3] = ((np.arange(h) * 255) // (h - 1))[:, None]
                ids.append(d)
                outs.append(_png_encode(px, ch, split_idat=(d % 11 == 0)))
            yield pd.DataFrame({id_col: ids, "payload": outs})

    out_schema = ST.StructType(
        [
            ST.StructField(id_col, ST.LongType()),
            ST.StructField("payload", ST.BinaryType()),
        ]
    )
    return df.select(id_col).mapInPandas(kernel, out_schema)


def decode_png_features(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """REAL image decode kernel — the round-3 stub slot, filled: PNG is
    zlib (stdlib) + byte arithmetic, so like the WAV kernel it needs no
    media library.  Full decode — chunk walk with CRC checks, multi-IDAT
    inflate, per-scanline unfilter (all five filter types), 8-bit
    gray/gray+alpha/RGB/RGBA — then per-channel means computed by exact
    integer sum / count (bit-stable).  Malformed payloads yield NULL
    features instead of failing the batch.  Same narrow Arrow-batched
    plan as every kernel here; payloads never shuffle."""
    import pandas as pd

    def kernel(batches) -> Iterator:
        cols = [id_col] + [f.name for f in PNG_FEATURES_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                parsed = _png_decode(bytes(getattr(rec, payload_col)))
                if parsed is None:
                    vals = (None,) * 7
                else:
                    w, h, ch, depth, px = parsed
                    n = w * h

                    def mean_of(c: int) -> float:
                        lane = px[:, c::ch]
                        return float(int(lane.sum(dtype="int64"))) / n

                    if ch <= 2:  # gray / gray+alpha: one luminance channel
                        m = mean_of(0)
                        means = (m, m, m)
                    else:
                        means = (mean_of(0), mean_of(1), mean_of(2))
                    vals = (w, h, ch, depth) + means
                rows.append((getattr(rec, id_col),) + vals)
            yield pd.DataFrame(rows, columns=cols)

    out_schema = ST.StructType(
        [ST.StructField(id_col, ST.LongType())] + list(PNG_FEATURES_SCHEMA.fields)
    )
    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def drop_payload_early(df: DataFrame, payload_col: str, feature_cols: list[str]) -> DataFrame:
    """The shuffle-hygiene pattern: project features and DROP the payload
    before any wide operation, so raw bytes never cross the network."""
    keep = [c for c in feature_cols if c != payload_col]
    return df.select(*keep)
