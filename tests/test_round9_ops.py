"""Round-9 operator pins.

- _persist_rotating eviction reorder: after an EXTERNAL cache eviction
  (spark.catalog.clearCache(), as bench.py and tools/scale_stress.py do
  between reps), re-rotating the SAME plan must leave the returned frame
  cached.  The r08 ordering (persist new, then unpersist prev) destroyed
  the fresh entry because Spark's CacheManager uncaches by plan equality
  — the SimHash64 family then ran cacheless (2.3 s/rep -> 8.3 s/rep).
- _persist_rotating exception path: a probe failure must never leave the
  returned frame uncached (ADVICE r08 item 3).
"""

from pyspark.sql import functions as F

from kwack_spark.operators.similarity import _ACTIVE_CACHE, _persist_rotating


def test_persist_rotating_survives_external_eviction(spark):
    """Rotate, materialize, clearCache, rotate the SAME plan again: the
    returned frame must be cached (storageLevel.useMemory), not destroyed
    by the displaced frame's unpersist."""
    plan = spark.range(100).withColumn("x", F.col("id") * 2)
    a = _persist_rotating("t_evict", plan)
    assert a.count() == 100
    assert a.storageLevel.useMemory

    spark.catalog.clearCache()  # external eviction between bench reps
    assert not a.storageLevel.useMemory

    # same logical plan, new DataFrame object — exactly a bench re-run
    plan2 = spark.range(100).withColumn("x", F.col("id") * 2)
    b = _persist_rotating("t_evict", plan2)
    assert b.count() == 100
    assert b.storageLevel.useMemory, (
        "re-persisted same-plan frame was evicted by prev.unpersist — "
        "unpersist must run BEFORE persist"
    )
    b.unpersist(False)
    del _ACTIVE_CACHE[spark]["t_evict"]


def test_persist_rotating_reuses_live_cache(spark):
    """Without an eviction, rotating the same plan returns the HELD frame
    (cache reuse), not a new persist."""
    plan = spark.range(50).withColumn("y", F.col("id") + 1)
    a = _persist_rotating("t_reuse", plan)
    a.count()
    b = _persist_rotating(
        "t_reuse", spark.range(50).withColumn("y", F.col("id") + 1)
    )
    assert b is a
    a.unpersist(False)
    del _ACTIVE_CACHE[spark]["t_reuse"]


def test_persist_rotating_rotates_distinct_plans(spark):
    """A genuinely different plan under the same tag displaces and
    unpersists the old frame and caches the new one."""
    a = _persist_rotating("t_rot", spark.range(3))
    a.count()
    b = _persist_rotating("t_rot", spark.range(7))
    assert b.count() == 7
    assert not a.storageLevel.useMemory  # rotated out
    assert b.storageLevel.useMemory
    b.unpersist(False)
    del _ACTIVE_CACHE[spark]["t_rot"]


# --- KLL mergeable quantile sketch --------------------------------------------


def test_kll_threshold_policy():
    from kwack_spark.operators.scale import kll_threshold

    assert kll_threshold(512, 64) is None       # n == 8k: keep all
    assert kll_threshold(100, 64) is None
    t = kll_threshold(513, 64)
    assert t == ((1 << 60) * 512) // 513        # exact integer arithmetic
    assert kll_threshold(5000, 64) == ((1 << 60) * 512) // 5000


def test_kll_sketch_bounded_and_merge_invariant(spark):
    """Register table holds <= k rows per group; merging the two parity
    halves equals sketching the whole input, register-for-register."""
    from kwack_spark.operators import scale

    rows = [(i, "g%d" % (i % 3), (i * 37) % 1000) for i in range(500)]
    d = spark.createDataFrame(rows, "doc_id long, g string, v long")
    kw = dict(k=16, by=("g",), seed="t9")
    full = scale.kll_sketch(d, "doc_id", "v", **kw)
    got = full.collect()
    from collections import Counter

    per_group = Counter(r.g for r in got)
    assert all(c <= 16 for c in per_group.values()) and len(per_group) == 3
    h0 = scale.kll_sketch(d.filter("doc_id % 2 = 0"), "doc_id", "v", **kw)
    h1 = scale.kll_sketch(d.filter("doc_id % 2 = 1"), "doc_id", "v", **kw)
    merged = scale.kll_merge(h0, h1, k=16, by=("g",)).collect()
    key = lambda r: (r.g, r.hr, r.rid, r.v)
    assert sorted(map(key, merged)) == sorted(map(key, got))


def test_kll_quantile_exact_on_small_input(spark):
    """With n <= k the sketch IS the data, so the quantile estimate must
    equal the exact deterministic-index percentile."""
    from kwack_spark.operators import scale

    rows = [(i, "a", v) for i, v in enumerate([10, 20, 30, 40, 50, 60, 70, 80, 90, 100])]
    d = spark.createDataFrame(rows, "doc_id long, g string, v long")
    sk = scale.kll_sketch(d, "doc_id", "v", k=64, by=("g",), seed="t9")
    est = {r.q: r.q_est for r in scale.kll_quantile(sk, (0.5, 0.9), by=("g",)).collect()}
    # ceil(0.5*10)=5 -> 50; ceil(0.9*10)=9 -> 90
    assert est == {0.5: 50, 0.9: 90}


def test_kll_prefilter_preserves_topk(spark):
    """The hash-rank prefilter must not change the register set (8x
    oversampling: the k smallest ranks always survive hr < 2^60*8k/n in
    any realistic draw — pinned on a concrete input)."""
    from kwack_spark.operators import scale

    rows = [(i, "a", i) for i in range(2000)]
    d = spark.createDataFrame(rows, "doc_id long, g string, v long")
    kw = dict(k=32, by=("g",), seed="t9p")
    plain = scale.kll_sketch(d, "doc_id", "v", **kw).collect()
    filt = scale.kll_sketch(d, "doc_id", "v", n_hint=2000, **kw).collect()
    key = lambda r: (r.hr, r.rid)
    assert sorted(map(key, filt)) == sorted(map(key, plain))


# --- iterated BPE merge application -------------------------------------------


def _py_bpe(word_freq, steps):
    """Independent reference: classic BPE training loop over symbol tuples
    with greedy leftmost-first merge application."""
    state = {tuple(w): f for w, f in word_freq.items()}
    out = []
    for step in range(1, steps + 1):
        counts = {}
        for syms, f in state.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, f"{a} {b}", n))
        nxt = {}
        for syms, f in state.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            nxt[key] = nxt.get(key, 0) + f
        state = nxt
    return out


def test_bpe_training_matches_python_reference(spark, tmp_path):
    """The 5-step trainer on an engineered corpus (overlapping runs,
    multi-char merges chaining into longer symbols) must equal the classic
    Python BPE loop."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kwack_spark.plans.registry import QUERIES, _load_all

    _load_all()
    docs = [
        "aaa abab banana banana bandana",
        "aaaa abab cabbage banana",
        "the theme there then banana band",
    ]
    texts = []
    for i, t in enumerate(docs):
        texts.append((i, t))
    # minimal documents.parquet the query's loader accepts
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in texts], pa.int64()),
            "text": pa.array([t for _, t in texts]),
            "lang": pa.array(["en"] * len(texts)),
            "n_chars": pa.array([len(t) for _, t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = [
        (r.step, r.pair, r.n)
        for r in QUERIES["bpe_merge_training_5steps"]
        .fn(spark, str(tmp_path))
        .collect()
    ]
    wf = {}
    import re

    for _, t in texts:
        for w in re.sub(r"[^a-z ]", "", t.lower()).split():
            if w:
                wf[w] = wf.get(w, 0) + 1
    assert got == _py_bpe(wf, 5)
