"""Round-6 operator pins.

- canonical_url: every normalization rule, one behavior per assert
  (fragment, scheme, host case, www., default vs non-default ports,
  trailing slash, tracking params, param sorting, path case preserved).
- dedup_longest_common_span: golden spans on a tiny fixture — a planted
  12-token verbatim overlap must surface as max_span_tokens == 12 via the
  diagonal gaps-and-islands, and a shingle shared by too many docs (df cap)
  must produce no pair.
"""

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from kwack_spark.functions import text as TX
from kwack_spark.plans.registry import QUERIES, _load_all

_load_all()


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [r.c for r in df.select(TX.canonical_url("u").alias("c")).collect()]


def test_canonical_url_rules(spark):
    cases = {
        # fragment + scheme + host case + www + default port + sort + utm
        "https://WWW.Ex.com:443/a/?b=2&a=1&utm_source=x#f": "ex.com/a?a=1&b=2",
        # scheme case-insensitive; bare host; trailing slash
        "HTTP://Example.COM/": "example.com",
        # non-default port preserved
        "https://ex.com:8080/p": "ex.com:8080/p",
        # path case preserved (only the host is case-insensitive)
        "https://EX.com/CaseSensitive/Path": "ex.com/CaseSensitive/Path",
        # all-tracking query collapses to no query at all
        "http://ex.com/p?utm_medium=a&gclid=b&fbclid=c": "ex.com/p",
        # empty-value and duplicate params survive, sorted byte-wise
        "https://ex.com/p?z=&a=2&a=1": "ex.com/p?a=1&a=2&z=",
        # www only stripped as a leading label
        "https://www.ex.com/x": "ex.com/x",
        "https://notwww.ex.com/x": "notwww.ex.com/x",
        # no scheme at all still normalizes
        "WWW.Ex.com/y/": "ex.com/y",
        # _ga is a tracking param; ref is FUNCTIONAL (selects content on
        # real sites, e.g. ?ref=<branch>) and must survive
        "https://ex.com/?ref=hn&_ga=1.2&q=spark": "ex.com?q=spark&ref=hn",
        # tracking params match case-insensitively (servers treat
        # UTM_SOURCE= and utm_source= identically)
        "https://ex.com/p?UTM_Source=x&GCLID=y&a=1": "ex.com/p?a=1",
    }
    got = _canon(spark, list(cases))
    for (raw, want), g in zip(cases.items(), got):
        assert g == want, f"{raw!r}: got {g!r}, want {want!r}"


def test_canonical_url_is_jvm_only(spark):
    """The canonicalizer must stay inside codegen — no Python stage."""
    df = spark.createDataFrame([("https://ex.com/a?b=1",)], "u string")
    plan = (
        df.select(TX.canonical_url("u").alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def _write_documents(tmp_path, rows):
    path = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["s"] * len(rows), pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        f"{path}/documents.parquet",
    )
    return path


# distinct ALPHABETIC words: the corpus tokenizer strips digits, so
# "w0".."w39" would all collapse to the single token "w"
import itertools as _it

WORDS = [
    "q" + a + b for a, b in _it.product("abcdefgh", repeat=2)
][:40]
_NATO = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()


def test_longest_common_span_golden(spark, tmp_path):
    """Two docs share a verbatim 12-token run (planted at different
    offsets) -> one pair with max_span_tokens == 12; an 8-token run shared
    verbatim -> exactly 8; unrelated docs -> absent."""
    shared12 = " ".join(_NATO[:12])
    shared8 = " ".join("x" + w for w in _NATO[:8])
    rows = [
        (0, " ".join(WORDS[:10]) + " " + shared12 + " tail zero here now"),
        (1, "alpha beta " + shared12 + " " + " ".join(WORDS[20:30])),
        (2, " ".join(WORDS[10:20]) + " " + shared8 + " omega"),
        (3, shared8 + " " + " ".join(WORDS[30:40])),
        (4, " ".join(reversed(WORDS))),
    ]
    sf = _write_documents(tmp_path, rows)
    got = {
        (r.id_a, r.id_b): r.max_span_tokens
        for r in QUERIES["dedup_longest_common_span"].fn(spark, sf).collect()
    }
    assert got[(0, 1)] == 12
    assert got[(2, 3)] == 8
    assert all(4 not in pair for pair in got)


def test_longest_common_span_df_cap_blocks_boilerplate(spark, tmp_path):
    """A 9-token boilerplate line pasted into 12 docs exceeds the df cap
    (10) for its shingles -> no pairs from it."""
    boiler = " ".join("z" + w for w in _NATO[:9])
    # per-doc tails are DISJOINT word triples, so the only cross-doc
    # shingles are the boilerplate ones (df = 12 > cap)
    rows = [(i, boiler + " " + " ".join(WORDS[3 * i : 3 * i + 3])) for i in range(12)]
    sf = _write_documents(tmp_path, rows)
    out = QUERIES["dedup_longest_common_span"].fn(spark, sf).collect()
    assert out == []


def test_url_canonical_families_collapse(spark):
    """Every surface-form family in the synthetic fixture collapses to one
    canonical key with 3 distinct raw variants (the HAVING >1 keeps all
    complete triples)."""
    df = QUERIES["dedup_url_canonical"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows, "expected families"
    # complete triples collapse fully; the corpus tail may leave one
    # 2-doc family when the doc count is not a multiple of 3
    assert all(r.n_docs in (2, 3) and r.n_variants == r.n_docs for r in rows)
    assert sum(r.n_docs == 3 for r in rows) > len(rows) - 2
    assert all("?" not in r.canon_url or "utm" not in r.canon_url for r in rows)


def test_embedding_covariance_golden(spark, tmp_path):
    """Hand-computed covariance on a 3-vector, 3-dim fixture: dims 0 and 1
    are exactly collinear (cov = 28/3 - 8 = 4/3), dim 2 is constant zero
    (cov 0 with everything); ordering is |cov| desc with (i, j) ties."""
    vecs = [(0, [1.0, 2.0, 0.0]), (1, [2.0, 4.0, 0.0]), (2, [3.0, 6.0, 0.0])]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
                "embedding": pa.array(
                    [v[1] for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * 3, pa.int32()),
            }
        ),
        f"{tmp_path}/embeddings.parquet",
    )
    rows = QUERIES["embedding_covariance_topk"].fn(spark, str(tmp_path)).collect()
    got = {(r.i, r.j): r.cov for r in rows}
    assert abs(got[(0, 1)] - 4.0 / 3.0) < 1e-8
    assert got[(0, 2)] == 0.0 and got[(1, 2)] == 0.0
    assert (rows[0].i, rows[0].j) == (0, 1)


def test_embedding_top_pc_golden(spark, tmp_path):
    """Rank-1 covariance fixture (same vectors as the covariance golden):
    C = outer((1,2,0)) * 2/3, so the top PC is (1,2,0)/sqrt(5) with
    eigenvalue tr(C) = 10/3 — power iteration is exact after one step."""
    import math

    vecs = [(0, [1.0, 2.0, 0.0]), (1, [2.0, 4.0, 0.0]), (2, [3.0, 6.0, 0.0])]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
                "embedding": pa.array(
                    [v[1] for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * 3, pa.int32()),
            }
        ),
        f"{tmp_path}/embeddings.parquet",
    )
    rows = QUERIES["embedding_top_pc"].fn(spark, str(tmp_path)).collect()
    got = {r.pos: r.loading for r in rows}
    s5 = math.sqrt(5.0)
    assert abs(got[0] - 1.0 / s5) < 1e-6
    assert abs(got[1] - 2.0 / s5) < 1e-6
    assert abs(got[2]) < 1e-9
    assert abs(rows[0].eigval - 10.0 / 3.0) < 1e-6


def test_bpe_two_steps_run_semantics(spark, tmp_path):
    """Pin greedy leftmost non-overlapping merging on symbol RUNS of every
    parity: corpus dominated by 'aa' picks merge1='aa'; applying it gives
    aaaa -> [aa, aa], aaaaa -> [aa, aa, a], aaaaaa -> [aa, aa, aa] (the
    doubled-separator pass; a naive shared-separator replace under-merges
    the even run and mis-orders the odd one)."""
    sf = _write_documents(
        tmp_path, [(0, "aa aa aa aa aa aa aaaa aaaaa aaaaaa")]
    )
    rows = QUERIES["bpe_train_two_steps"].fn(spark, sf).collect()
    got = {r.pair: r.n for r in rows}
    assert all(r.merge1 == "aa" for r in rows)
    # aaaa: aa+aa (1); aaaaa: aa+aa, aa+a (1 each); aaaaaa: aa+aa x2
    assert got == {"aa+aa": 4, "aa+a": 1}


def test_embedding_pc_residual_rank1_is_zero(spark, tmp_path):
    """On the rank-1 fixture every vector lies ON the top PC, so the
    residual energy is exactly 0 (to the 6dp round) and the projection
    equals the vector norm (PC signs are positive from the uniform start
    vector)."""
    import math

    vecs = [(0, [1.0, 2.0, 0.0]), (1, [2.0, 4.0, 0.0]), (2, [3.0, 6.0, 0.0])]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
                "embedding": pa.array([v[1] for v in vecs], pa.list_(pa.float32())),
                "label": pa.array([0] * 3, pa.int32()),
            }
        ),
        f"{tmp_path}/embeddings.parquet",
    )
    rows = QUERIES["embedding_pc_residual_topk"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 3
    assert all(r.resid2 == 0.0 for r in rows)
    by_id = {r.vec_id: r.proj for r in rows}
    assert abs(by_id[0] - math.sqrt(5.0)) < 1e-6
    assert abs(by_id[2] - 3 * math.sqrt(5.0)) < 1e-6


# --- round-6 wave 2: sparse cosine, robust outliers, bitext margin,
# stream-stream join, duplicate-graph PageRank ------------------------------


def _write_embeddings(tmp_path, vecs, labels=None):
    labels = labels or [0] * len(vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
                "embedding": pa.array(
                    [v[1] for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{tmp_path}/embeddings.parquet",
    )
    return str(tmp_path)


def _write_events(tmp_path, rows):
    """rows: (event_id, ts_iso, user_id, event_type, value)."""
    import datetime as dt

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [dt.datetime.fromisoformat(r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([float(r[4]) for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    return str(tmp_path)


def test_tfidf_cosine_only_term_sharing_pairs(spark, tmp_path):
    """Docs 0/1 share two rare terms -> the ONLY emitted pair, with the
    hand-computed 6dp-rounded-weight cosine; docs 2/3 share nothing."""
    import math

    rows = [
        (0, "qaa qab qac"),
        (1, "qaa qab qad"),
        (2, "qae qaf"),
        (3, "qag qah"),
    ]
    sf = _write_documents(tmp_path, rows)
    out = QUERIES["tfidf_cosine_topk"].fn(spark, sf).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(0, 1)]
    w2 = round(math.log(4 / 2), 6)  # shared terms, df=2
    w1 = round(math.log(4 / 1), 6)  # unique terms, df=1
    want = round(2 * w2 * w2 / (2 * w2 * w2 + w1 * w1), 6)
    assert abs(out[0].cosine - want) < 1e-9


def test_event_robust_outliers_golden(spark, tmp_path):
    """Values 1..9 plus a 100 spike: median 5.5, MAD 2.5 -> only the spike
    crosses |z| > 3.5, and its z matches the hand formula."""
    base = "2024-01-01T00:{:02d}:00"
    rows = [
        (i, base.format(i), 1, "click", float(v))
        for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])
    ]
    sf = _write_events(tmp_path, rows)
    out = QUERIES["event_robust_outliers"].fn(spark, sf).collect()
    assert [(r.event_id, r.value) for r in out] == [(9, 100.0)]
    r = out[0]
    assert r.med == 5.5 and r.mad == 2.5
    assert abs(r.rz - round((100 - 5.5) / (1.4826 * 2.5), 6)) < 1e-9


def test_bitext_margin_standout_beats_hub(spark, tmp_path):
    """A source vector with ONE perfect target match (margin 1 - 0.25)
    outranks a hub source equally close to every target (margin 0)."""
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),  # src A: standout match to tgt 10
        (1, [0.5, 0.5, 0.5, 0.5]),  # src B: hub, cos 0.5 with every tgt
        (10, [1.0, 0.0, 0.0, 0.0]),
        (11, [0.0, 1.0, 0.0, 0.0]),
        (12, [0.0, 0.0, 1.0, 0.0]),
        (13, [0.0, 0.0, 0.0, 1.0]),
    ]
    sf = _write_embeddings(tmp_path, vecs, labels=[0, 0, 1, 1, 1, 1])
    rows = QUERIES["bitext_margin_mining"].fn(spark, sf).collect()
    by_src = {r.src_id: r for r in rows}
    assert by_src[0].tgt_id == 10 and by_src[0].cos_top1 == 1.0
    assert abs(by_src[0].margin - 0.75) < 1e-9
    assert abs(by_src[1].margin) < 1e-9
    assert rows[0].src_id == 0  # ordered by margin desc


def test_streaming_ss_join_window_semantics(spark, tmp_path):
    """Stream-stream interval join: purchase within [click, click+30m]
    matches; a later purchase and a purchase BEFORE the click do not."""
    rows = [
        (0, "2024-01-01T10:00:00", 1, "click", 1.0),
        (1, "2024-01-01T10:10:00", 1, "purchase", 1.0),  # match
        (2, "2024-01-01T10:45:00", 1, "purchase", 1.0),  # outside window
        (3, "2024-01-01T09:00:00", 2, "purchase", 1.0),  # before click
        (4, "2024-01-01T09:30:00", 2, "click", 1.0),
        (5, "2024-01-01T11:00:00", 3, "click", 1.0),  # no purchase
    ]
    sf = _write_events(tmp_path, rows)
    out = QUERIES["streaming_click_purchase_join"].fn(spark, sf).collect()
    assert [(r.user_id, r.click_id, r.purchase_id) for r in out] == [(1, 0, 1)]


def test_pagerank_components_and_dangling(spark, tmp_path):
    """Triangle (3 identical docs) + pair (2 identical docs) + 2 singletons:
    regular components keep uniform rank, connected nodes outrank dangling
    singletons, degrees are exact, and total mass stays ~1."""
    tri = " ".join(_NATO[:12])
    pair = " ".join("x" + w for w in _NATO[:12])
    rows = [
        (0, tri), (1, tri), (2, tri),
        (3, pair), (4, pair),
        (5, " ".join(WORDS[:12])),
        (6, " ".join(reversed(WORDS))),
    ]
    sf = _write_documents(tmp_path, rows)
    out = QUERIES["pagerank_dup_graph"].fn(spark, sf).collect()
    assert len(out) == 7
    by_id = {r.doc_id: r for r in out}
    assert {i: by_id[i].degree for i in range(7)} == {
        0: 2, 1: 2, 2: 2, 3: 1, 4: 1, 5: 0, 6: 0,
    }
    assert by_id[0].pr == by_id[1].pr == by_id[2].pr
    assert by_id[3].pr == by_id[4].pr
    assert by_id[5].pr == by_id[6].pr
    assert by_id[0].pr > by_id[5].pr and by_id[3].pr > by_id[5].pr
    assert abs(sum(r.pr for r in out) - 1.0) < 1e-6


def test_triangles_k4_clique_golden(spark, tmp_path):
    """Four identical docs form K4: every node has degree 3, sits in
    C(3,2)=3 triangles, clustering coefficient exactly 1.  A 2-doc pair
    (degree 1) is excluded by the d >= 2 filter; singletons never appear."""
    k4 = " ".join(_NATO[:12])
    pair = " ".join("x" + w for w in _NATO[:12])
    rows = [
        (0, k4), (1, k4), (2, k4), (3, k4),
        (4, pair), (5, pair),
        (6, " ".join(WORDS[:12])),
    ]
    sf = _write_documents(tmp_path, rows)
    out = QUERIES["dup_graph_triangles"].fn(spark, sf).collect()
    assert [(r.doc_id, r.degree, r.n_triangles, r.clustering) for r in out] == [
        (i, 3, 3, 1.0) for i in range(4)
    ]


def test_streaming_latest_per_key_upsert_semantics(spark, tmp_path):
    """The streamed latest-state view picks the max-(ts, event_id) row per
    user — including the tie on ts, which must resolve to the higher
    event_id — and counts lifetime events."""
    rows = [
        (0, "2024-01-01T10:00:00", 1, "click", 1.5),
        (1, "2024-01-01T11:00:00", 1, "view", 2.5),   # latest for user 1
        (2, "2024-01-01T09:00:00", 1, "click", 0.5),
        (3, "2024-01-01T10:00:00", 2, "click", 7.0),
        (4, "2024-01-01T10:00:00", 2, "view", 8.0),   # ts tie -> id 4 wins
    ]
    sf = _write_events(tmp_path, rows)
    out = {
        r.user_id: r
        for r in QUERIES["streaming_latest_per_key"].fn(spark, sf).collect()
    }
    assert out[1].latest_event_id == 1 and out[1].latest_value == 2.5
    assert out[1].n_events == 3
    assert out[2].latest_event_id == 4 and out[2].latest_value == 8.0
    assert out[2].n_events == 2


def test_jl_projection_identical_vectors_full_recall(spark, tmp_path):
    """Vectors that are exact copies keep recall 1.0 under ANY linear
    projection: with 9 vectors = 3 groups of 3 identical embeddings, each
    query's exact top-2 (its two copies, cos = 1) survives the sketch, so
    n_overlap >= 2 for every query."""
    base = [
        [1.0 if i == k else 0.1 * ((i * 7 + k) % 5) for i in range(64)]
        for k in range(3)
    ]
    vecs = [(i, base[i % 3]) for i in range(9)]
    sf = _write_embeddings(tmp_path, vecs)
    rows = QUERIES["jl_projection_recall"].fn(spark, sf).collect()
    assert len(rows) == 8
    assert all(r.n_overlap >= 2 for r in rows)
    assert all(abs(r.recall_at_5 - r.n_overlap / 5.0) < 1e-12 for r in rows)


def test_tfidf_cosine_absolute_df_cap(spark, tmp_path):
    """A term pasted into 300 docs exceeds the absolute posting cap
    (df > 256) and must generate NO pairs, while a rare shared term still
    does — the fan-out bound that keeps the self-join linear at scale."""
    rows = [(i, "qzz" + str_suffix(i)) for i in range(300)]
    # give docs 0 and 1 an extra rare shared term
    rows[0] = (0, rows[0][1] + " qrare")
    rows[1] = (1, rows[1][1] + " qrare")
    sf = _write_documents(tmp_path, rows)
    out = QUERIES["tfidf_cosine_topk"].fn(spark, sf).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(0, 1)]


def str_suffix(i):
    # distinct ALPHABETIC per-doc filler (digits are stripped by the
    # tokenizer): base-26 letters
    s = ""
    i += 1
    while i:
        s += chr(ord("a") + i % 26)
        i //= 26
    return " qf" + s
