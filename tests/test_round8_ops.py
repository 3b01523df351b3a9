"""Round-8 operator pins.

- exact_duplicate_spans: output must equal an independent Python
  reference (brute-force window enumeration + run merge) on a fixture
  with engineered shared spans, partial overlaps, and within-doc repeats;
  md5 anchor filtering must be invisible (exact verify contract).
- dhash64 / synth_png_blocky: the decoded-and-downsampled fingerprint
  must equal the closed-form md5 grid dHash (independent Python
  reference), distance-0 within (g, v) classes, <= 2 bits across
  variants of one g; malformed payloads must yield NULL.
- fingerprint_hamming_pairs: blocked pairs over an arbitrary (id, fp)
  table must equal the brute-force bit_count join (losslessness of the
  factored-out core).
- auto_n_lists: integer sqrt-power-of-two policy boundaries.
"""

import hashlib
import re

from pyspark.sql import functions as F

from kwack_spark.operators import dedup, multimodal as mm, similarity


# --- exact_duplicate_spans ---------------------------------------------------

W = 5  # small window so the fixture stays readable


def _ref_spans(docs, w):
    """Brute-force reference: every w-token window seen >= 2 times is a
    duplicated anchor; merge consecutive anchor positions per doc."""
    toks = {}
    for did, text in docs:
        norm = re.sub(r"[^a-z ]", "", text.lower())
        tk = [t for t in norm.split(" ") if t]
        if len(tk) >= w:
            toks[did] = tk
    windows = {}
    for did, tk in toks.items():
        for p in range(len(tk) - w + 1):
            windows.setdefault(" ".join(tk[p : p + w]), []).append((did, p + 1))
    dup_pos = {}
    for s, occ in windows.items():
        if len(occ) >= 2:
            for did, p in occ:
                dup_pos.setdefault(did, set()).add(p)
    out = set()
    for did, ps in dup_pos.items():
        run = []
        for p in sorted(ps):
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    a, b = run[0], run[-1] + w - 1
                    out.add((did, a, b - a + 1, " ".join(toks[did][a - 1 : b])))
                run = [p]
        if run:
            a, b = run[0], run[-1] + w - 1
            out.add((did, a, b - a + 1, " ".join(toks[did][a - 1 : b])))
    return out


SPAN_DOCS = [
    # 1 and 2 share an 8-token prefix (maximal span longer than the window)
    (1, "alpha beta gamma delta epsilon zeta eta theta one two three"),
    (2, "alpha beta gamma delta epsilon zeta eta theta nine eight seven"),
    # 3 repeats a 5-token phrase from 1's tail plus its own filler
    (3, "xx yy epsilon zeta eta theta one zz ww vv uu"),
    # 4 has a WITHIN-DOC repeat of one 5-token window
    (4, "p q r s t p q r s t k l m n o"),
    # 5 shares nothing
    (5, "completely unrelated words forming a different document body here"),
    # 6 too short to carry a window
    (6, "tiny doc"),
]


def test_exact_spans_match_python_reference(spark):
    d = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_tokens, r.span_text)
        for r in dedup.exact_duplicate_spans(d, "doc_id", "text", min_tokens=W).collect()
    }
    assert got == _ref_spans(SPAN_DOCS, W)
    # sanity on the engineered structure: doc 2 carries the shared 8-token
    # prefix; doc 1's maximal span is 9 tokens because the doc-3 overlap
    # ("epsilon zeta eta theta one") extends the same run by one position
    by_doc = {r[0]: r for r in got}
    assert by_doc[1][2] == 9 and by_doc[2][2] == 8
    assert by_doc[1][3].startswith("alpha beta gamma")
    assert 5 not in by_doc and 6 not in by_doc


def test_exact_spans_empty_when_no_duplicates(spark):
    d = spark.createDataFrame(
        [(1, "one singular document with unique words only")],
        "doc_id long, text string",
    )
    assert dedup.exact_duplicate_spans(d, "doc_id", "text", min_tokens=3).count() == 0


# --- dHash / blocky PNG fixture ---------------------------------------------


def _ref_dhash(g: int, v: int) -> int:
    grid = {}
    for j in range(8):
        for i in range(9):
            val = int(hashlib.md5(f"ph:{g}:{j}:{i}".encode()).hexdigest()[:2], 16)
            if v > 0 and j == v - 1 and i == 0:
                val = 255 - val
            grid[(j, i)] = val
    fp = 0
    for j in range(8):
        for i in range(8):
            if grid[(j, i)] < grid[(j, i + 1)]:
                fp |= 1 << (j * 8 + i)
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def test_dhash64_matches_closed_form(spark):
    ids = list(range(300))  # covers g 0..127 and variants v 0..2
    d = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    png = mm.synth_png_blocky(d, "doc_id")
    got = {r.doc_id: r.fp for r in mm.dhash64(png, "payload", "doc_id").collect()}
    assert len(got) == len(ids)
    for i in ids:
        assert got[i] == _ref_dhash(i % 128, (i // 128) % 4), i


def test_dhash64_variant_distances():
    import numpy as np  # noqa: F401

    for g in (0, 7, 63):
        f0 = _ref_dhash(g, 0)
        for v in (1, 2, 3):
            fv = _ref_dhash(g, v)
            assert bin((f0 ^ fv) & (2**64 - 1)).count("1") <= 2


def test_dhash64_malformed_payload_null(spark):
    d = spark.createDataFrame(
        [(1, bytearray(b"not a png at all"))], "doc_id long, payload binary"
    )
    rows = mm.dhash64(d, "payload", "doc_id").collect()
    assert rows[0].fp is None


def test_fingerprint_hamming_pairs_lossless(spark):
    import random

    rng = random.Random(8)
    fps = []
    base = rng.getrandbits(63)
    for i in range(40):
        fp = base
        for _ in range(rng.randrange(0, 9)):  # 0-8 bit flips off the base
            fp ^= 1 << rng.randrange(64)
        fps.append((i, fp - (1 << 64) if fp >= (1 << 63) else fp))
    df = spark.createDataFrame(fps, "doc_id long, fp long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.fingerprint_hamming_pairs(df, "doc_id", 3, 4).collect()
    }
    want = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            h = bin((fps[i][1] ^ fps[j][1]) & (2**64 - 1)).count("1")
            if h <= 3:
                want.add((fps[i][0], fps[j][0], h))
    assert got == want


# --- auto_n_lists -------------------------------------------------------------


def test_auto_n_lists_policy():
    assert similarity.auto_n_lists(0) == 16
    assert similarity.auto_n_lists(256) == 16
    assert similarity.auto_n_lists(257) == 32
    assert similarity.auto_n_lists(1024) == 32
    assert similarity.auto_n_lists(1025) == 64
    assert similarity.auto_n_lists(500) == 32
    assert similarity.auto_n_lists(2000) == 64
    assert similarity.auto_n_lists(200_000) == 512
