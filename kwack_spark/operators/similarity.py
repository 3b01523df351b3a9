"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k.  The query set is broadcast (it is
  the small side by definition); the corpus streams partition-parallel, each
  task emitting its local pairs, and the final top-k per query is a shuffle
  on query id.  At 100 TB corpus this is the right baseline: no index build,
  one broadcast + one narrow pass + one k-row-per-query shuffle.
- lsh_bucketed_pairs: random-hyperplane LSH — deterministic ±1 planes derived
  from md5 parity so the operator needs no stored model.  Vectors
  shuffle once on their bucket signature; candidates are only compared within
  a bucket (multi-probe via several independent tables).  This is the scale
  path when queries == corpus (all-pairs near-dup at n where n² is infeasible).
- embedding_dup_keepers: embedding-cosine near-dup resolution — LSH-blocked
  pairs above a cosine threshold, reduced to one (dup_id -> keep_id) decision
  per duplicate (keeper = lowest-id qualifying neighbor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kwack_spark.functions import vectors as V


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact top-k neighbors by cosine for every query vector."""
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), V.as_double(vec_col).alias("cvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), V.as_double(vec_col).alias("qvec")
    )
    pairs = c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "corpus_id",
        V.cosine(F.col("qvec"), F.col("cvec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "corpus_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


MAX_BROADCAST_INDEX_ROWS = 200_000  # ~100 MB at dim=64 float64 — driver-safe cap


def _within_cap(df: DataFrame, cap: int) -> bool:
    """Broadcast-cap probe on the FIRST column only (ids).  A beyond-cap
    table must never ship cap+1 vector-bearing rows to the driver just to
    be discarded in favor of the distributed branch — the probe is a
    count() over ids (bytes, not a ~100 MB driver spike at dim 64); the
    under-cap branch collects vectors afterwards, when they are known to
    fit."""
    return df.select(df.columns[0]).limit(cap + 1).count() <= cap


def brute_force_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    max_index_rows: int = MAX_BROADCAST_INDEX_ROWS,
    label_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k: BLAS candidate selection + exact re-score.

    Two stages:
    1. Candidate selection (mapInPandas): the corpus matrix is L2-normalized
       once and broadcast (size-capped, never an unbounded collect); each
       Arrow batch of queries does one numpy matmul and a partial argsort,
       emitting only (query_id, corpus_id) candidate ids — no join, no
       shuffle, k ids per query produced locally in the scan task.  This is
       the 100 TB shape: queries stream partition-parallel against a
       broadcast index.  Past the cap the roles INVERT instead of refusing:
       the query batch is broadcast and the corpus streams, each Arrow
       batch emitting its local top-k (exhaustive exact scan, corpus never
       leaves the executors); only when BOTH sides exceed the cap does the
       operator raise, pointing at lsh_bucketed_pairs.
    2. Exact re-score (JVM-side): the n_q*k surviving pairs are joined back to
       their vectors and scored with the same sequential-fold cosine the
       DuckDB oracle computes — bit-exact output, while the O(n_q*n_c) work
       stays inside BLAS.  (BLAS scores differ from a sequential fold in the
       last ulp, so ranks are re-derived from the exact scores; the top-k
       *set* only depends on BLAS ordering at ulp-close boundaries.)
    """
    import numpy as np
    import pandas as pd

    sel = [id_col, vec_col] + ([label_col] if label_col else [])
    spark = corpus.sparkSession
    if _within_cap(corpus.select(*sel), max_index_rows):
        rows = corpus.select(*sel).collect()
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        m = np.array([list(r[1]) for r in rows], dtype=np.float64)
        m_n = m / np.linalg.norm(m, axis=1, keepdims=True)
        # labels are only compared for (in)equality, so keep whatever dtype
        # the column has — np.array without a forced dtype handles string /
        # object class labels as well as ints
        labels = np.array([r[2] for r in rows]) if label_col else None
        bc = spark.sparkContext.broadcast((ids, m_n, labels))

        def topk_ids(batches):
            c_ids, c_mat, c_labels = bc.value
            for pdf in batches:
                q_ids = pdf[id_col].to_numpy(dtype=np.int64)
                q = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
                q_n = q / np.linalg.norm(q, axis=1, keepdims=True)
                q_labels = (
                    pdf[label_col].to_numpy() if c_labels is not None else None
                )
                scores = q_n @ c_mat.T
                # exclusion mask: self-pairs, or (hard-negative mode) the
                # query's own label; then top-k candidate ids by (-cosine, id)
                out_q, out_c = [], []
                for qi in range(len(q_ids)):
                    s = scores[qi]
                    if q_labels is not None:
                        mask = c_labels != q_labels[qi]
                    else:
                        mask = c_ids != q_ids[qi]
                    order = np.lexsort((c_ids[mask], -s[mask]))[:k]
                    out_q.extend([q_ids[qi]] * len(order))
                    out_c.extend(c_ids[mask][order])
                yield pd.DataFrame({"query_id": out_q, "corpus_id": out_c})

        from kwack_spark.operators.scale import widen_if_narrow

        # per-Arrow-batch matmuls run where the scan's splits are — widen a
        # single-row-group bench scan so batches use every core (no-op at
        # scale); per-query output is independent of batch composition
        q_in = widen_if_narrow(queries.select(*sel) if label_col else queries)
        cand = q_in.mapInPandas(topk_ids, "query_id long, corpus_id long")
    else:
        # Beyond the cap the roles invert (mirror of pq_topk's distributed
        # branch): the QUERY batch is broadcast and the corpus streams
        # partition-parallel — each Arrow batch one BLAS matmul, emitting
        # its local top-k per query (top-k is distributive, so the union is
        # a superset of the global answer; the exact re-score + window
        # below restore the global ranking).  The corpus never leaves the
        # executors — the genuine 100-TB exhaustive-scan shape for small
        # query batches.  Raises only when BOTH sides exceed the cap (then
        # an exhaustive exact scan is the wrong tool: lsh_bucketed_pairs).
        if not _within_cap(queries.select(*sel), max_index_rows):
            raise ValueError(
                f"both corpus and query set exceed max_index_rows="
                f"{max_index_rows}; use lsh_bucketed_pairs for all-pairs "
                "similarity over corpora too large to broadcast either side"
            )
        q_rows = queries.select(*sel).collect()
        q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
        qm = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
        qm_n = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        q_labels = np.array([r[2] for r in q_rows]) if label_col else None
        bcq = spark.sparkContext.broadcast((q_ids, qm_n, q_labels))

        def batch_topk(batches):
            bq_ids, bq_mat, bq_labels = bcq.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                c_ids = pdf[id_col].to_numpy(dtype=np.int64)
                c = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
                c_n = c / np.linalg.norm(c, axis=1, keepdims=True)
                c_labels = (
                    pdf[label_col].to_numpy() if bq_labels is not None else None
                )
                scores = bq_mat @ c_n.T  # (n_q, batch_rows)
                out_q, out_c = [], []
                for qi in range(len(bq_ids)):
                    s = scores[qi]
                    if c_labels is not None:
                        mask = c_labels != bq_labels[qi]
                    else:
                        mask = c_ids != bq_ids[qi]
                    order = np.lexsort((c_ids[mask], -s[mask]))[:k]
                    out_q.extend([bq_ids[qi]] * len(order))
                    out_c.extend(c_ids[mask][order])
                yield pd.DataFrame({"query_id": out_q, "corpus_id": out_c})

        from kwack_spark.operators.scale import widen_if_narrow

        # no dedup needed: each corpus row lives in exactly one Arrow batch
        # (widening only re-places rows; the per-batch local top-k union is
        # a superset of the global top-k for ANY batching, and the exact
        # re-score + window below restore the global ranking)
        cand = widen_if_narrow(corpus.select(*sel)).mapInPandas(
            batch_topk, "query_id long, corpus_id long"
        )
    qv = queries.select(F.col(id_col).alias("query_id"), V.as_double(vec_col).alias("qvec"))
    cv = corpus.select(F.col(id_col).alias("corpus_id"), V.as_double(vec_col).alias("cvec"))
    scored = (
        cand.join(qv, "query_id")
        .join(cv, "corpus_id")
        .select("query_id", "corpus_id", V.cosine(F.col("qvec"), F.col("cvec")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "corpus_id")
    # the rank filter is a no-op on the broadcast path (exactly k candidates
    # per query) but required on the distributed path, whose per-batch local
    # top-k unions to up to k * n_batches candidates per query
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


POW2_43 = 8796093022208.0  # 2^43: scales float32-derived doubles to integers


def auto_n_lists(n_rows: int, floor: int = 16) -> int:
    """IVF list count that keeps probe cost sublinear as the corpus grows
    (r07 VERDICT ask #3 — the IVF sibling of ``auto_planes``): the smallest
    power of two P >= ``floor`` with P*P >= n, i.e. sqrt(n) rounded up to a
    power of two.  With FIXED n_lists, each probed list holds n/n_lists
    vectors, so probing a constant list count scans a constant FRACTION of
    the corpus — O(n) per query forever.  At P ~ sqrt(n) both the centroid
    scan (P) and the probed candidate count (n_probe * n/P) grow as
    sqrt(n) — the classic IVF balance point.  Pure integer arithmetic (no
    log2/sqrt floats) so Spark, Python, and the DuckDB oracle agree on the
    boundary exactly."""
    p = floor
    while p * p < n_rows:
        p *= 2
    return p


def ivf_assign(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int | str = 16,
    refine_iters: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF clustering -> (centroids(cid, cv),
    assigned(corpus_id, v, list_id)).  Seeds are the ``n_lists`` lowest-id
    vectors; each ``refine_iters`` Lloyd iteration computes per-list means
    with exact integer arithmetic (components scaled by 2^43, summed as
    DECIMAL) so centroids are bit-identical across engines.  Shared by
    ivf_topk (probe + rerank) and semdedup_prune (cluster + prune).

    ``n_lists="auto"`` sizes the index from the corpus row count via
    ``auto_n_lists`` (one count() action — parquet metadata at scale; the
    seed take is then a distributed TakeOrdered of ~sqrt(n) rows, the same
    bounded collect a production k-means trainer samples)."""
    if n_lists == "auto":
        n_lists = auto_n_lists(corpus.count())
    from kwack_spark.operators.scale import widen_if_narrow

    cents = (
        corpus.orderBy(id_col)
        .limit(n_lists)
        .select(F.col(id_col).alias("cid"), V.as_double(vec_col).alias("cv"))
    ).withColumn("ncv", V.norm(F.col("cv")))
    # the per-(vector, centroid) fold stage is the expensive pass; a
    # single-row-group bench scan would run it on one task (no-op at scale)
    c = widen_if_narrow(corpus).select(
        F.col(id_col).alias("corpus_id"), V.as_double(vec_col).alias("v")
    ).withColumn("nv", V.norm(F.col("v")))  # once per vector, not per centroid

    def _assign(cent_df: DataFrame) -> DataFrame:
        # nearest centroid per corpus vector (ties -> smaller cid); cosine
        # via precomputed norms = one fold per (vector, centroid) — the
        # identical IEEE value the inline form produces
        scored = c.crossJoin(F.broadcast(cent_df)).select(
            "corpus_id",
            "v",
            "cid",
            (V.dot(F.col("v"), F.col("cv")) / (F.col("nv") * F.col("ncv"))).alias("cc"),
        )
        return scored.groupBy("corpus_id").agg(
            F.max_by(
                "cid", F.struct(F.col("cc"), (-F.col("cid")).alias("n"))
            ).alias("list_id"),
            F.first("v").alias("v"),
        )

    for _ in range(refine_iters):
        comp = _assign(cents).select(
            "list_id", F.posexplode("v").alias("pos", "comp")
        )
        means = comp.groupBy("list_id", "pos").agg(
            (
                F.sum((F.col("comp") * POW2_43).cast("decimal(38,0)")).cast("double")
                / POW2_43
                / F.count(F.lit(1))
            ).alias("m")
        )
        cents = (
            means.groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                F.col("list_id").alias("cid"),
                F.transform("pm", lambda s: s.getField("m")).alias("cv"),
            )
        ).withColumn("ncv", V.norm(F.col("cv")))  # refreshed centroids' norms

    if refine_iters:
        # the refined centroid table is n_lists rows but its lineage is a
        # full Lloyd pipeline (corpus assign + decimal component means);
        # every consumer (the final _assign here, plus any caller probing
        # the same index) would otherwise re-execute that pipeline per use.
        # Rotating persist (r07 ADVICE #2): at most one cached centroid
        # table stays pinned across repeated calls in a long-lived session.
        cents = _persist_rotating("ivf_cents", cents)
    return cents, _assign(cents)


def semdedup_prune(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    threshold: float = 0.95,
    refine_iters: int = 1,
) -> DataFrame:
    """SemDeDup (semantic deduplication by cluster-then-prune): cluster the
    embedding space with deterministic IVF centroids, then WITHIN each
    cluster prune every item that has a lower-id neighbor with cosine >=
    ``threshold`` — one canonical representative (the lowest id) survives
    per near-duplicate neighborhood.

    Returns (vec_id, list_id, pruned, kept_by): ``kept_by`` is the smallest
    qualifying lower-id neighbor (NULL when kept).

    Scale shape: the pairwise compare is QUADRATIC ONLY WITHIN a cluster —
    the whole point of clustering first.  Size ``n_lists ≈ n /
    target_cluster_size`` so each cluster's self-join stays bounded (e.g.
    1k-10k rows); the join shuffles once on list_id and never compares
    across clusters (SemDeDup's accepted approximation: cross-cluster
    near-dups are missed, recall is traded for tractability at 100 TB)."""
    _, assigned = ivf_assign(corpus, id_col, vec_col, n_lists, refine_iters)
    assigned = assigned.withColumn("nv", V.norm(F.col("v")))  # once per vector
    x, y = assigned.alias("x"), assigned.alias("y")
    dup_of = (
        x.join(y, "list_id")
        .filter(F.col("x.corpus_id") > F.col("y.corpus_id"))
        .select(
            F.col("x.corpus_id").alias("vec_id"),
            F.col("y.corpus_id").alias("nb"),
            (V.dot(F.col("x.v"), F.col("y.v")) / (F.col("x.nv") * F.col("y.nv"))).alias("c"),
        )
        .filter(F.col("c") >= threshold)
        .groupBy("vec_id")
        .agg(F.min("nb").alias("kept_by"))
    )
    return (
        assigned.select(F.col("corpus_id").alias("vec_id"), "list_id")
        .join(dup_of, "vec_id", "left")
        .select(
            "vec_id",
            "list_id",
            F.col("kept_by").isNotNull().alias("pruned"),
            "kept_by",
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_lists: int = 16,
    n_probe: int = 4,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are assigned to
    their nearest centroid's list; queries probe only the ``n_probe`` nearest
    lists, so each query compares against ~``n_probe/n_lists`` of the corpus.

    Centroid choice is DETERMINISTIC and oracle-checkable in SQL: seeds are
    the ``n_lists`` lowest-id vectors, optionally refined by ``refine_iters``
    Lloyd (k-means) iterations whose per-list means are computed with exact
    integer arithmetic (components scaled by 2^43 — a pure exponent shift —
    then summed as DECIMAL), so the refined centroids are bit-identical
    across engines.  One refinement lifts recall@3 from 0.52 to 0.58 at
    n_probe=4 on the sf0.01 fixture; production replaces the seed table with
    trained centroids, same plumbing.

    Scale shape: centroids broadcast (tiny); assignment is one partial-
    aggregated shuffle per corpus row (max_by keeps one row per vector); a
    refinement adds a (list_id, pos)-keyed aggregation whose output is
    n_lists*dim rows.  Candidate generation shuffles on list_id.  Size
    ``n_lists`` ~ sqrt(n) at scale so lists stay balanced and the probe
    fraction stays constant.
    """
    cents, assigned = ivf_assign(corpus, id_col, vec_col, n_lists, refine_iters)
    return ivf_probe_topk(cents, assigned, queries, id_col, vec_col, k, n_probe)


def ivf_probe_topk(
    cents: DataFrame,
    assigned: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probe: int = 4,
) -> DataFrame:
    """The PROBE half of IVF top-k against a PREBUILT index — ``cents``
    (cid, cv[, ncv]) and ``assigned`` (corpus_id, v, list_id) as produced
    by ``ivf_assign`` and, in production, written once and read per query
    batch (the index is built/trained once and amortized over the query
    stream; tools/scale_stress.py measures exactly this split).  Identical
    results to ``ivf_topk``, which composes assign + probe."""
    if "ncv" not in cents.columns:  # a parquet-roundtripped index drops it
        cents = cents.withColumn("ncv", V.norm(F.col("cv")))
    assigned = assigned.withColumn("nv", V.norm(F.col("v")))
    q = queries.select(
        F.col(id_col).alias("query_id"), V.as_double(vec_col).alias("qv")
    ).withColumn("nqv", V.norm(F.col("qv")))  # once per query, not per candidate

    # probe: each query's n_probe nearest lists (same ordering rule)
    scored_q = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "qv",
        "nqv",
        "cid",
        (V.dot(F.col("qv"), F.col("cv")) / (F.col("nqv") * F.col("ncv"))).alias("qc"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("qc"), "cid")
    probes = (
        scored_q.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "nqv", F.col("cid").alias("list_id"))
    )

    # rerank candidates within probed lists only — one fold per candidate
    cand = probes.join(assigned, "list_id").filter(
        F.col("query_id") != F.col("corpus_id")
    )
    scored = cand.select(
        "query_id",
        "corpus_id",
        (V.dot(F.col("qv"), F.col("v")) / (F.col("nqv") * F.col("nv"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "corpus_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    ).select("query_id", "corpus_id", "cosine", "rank")


# Rotation state is keyed per SparkSession (weakly — a stopped, dropped
# session releases its entry instead of pinning the last DataFrame's plan
# forever) and guarded by a lock so concurrent callers in different
# sessions cannot unpersist each other's index cache mid-build.
import threading as _threading
import weakref as _weakref

_ACTIVE_CACHE: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()
_ACTIVE_CACHE_LOCK = _threading.Lock()


def _persist_rotating(tag: str, df: DataFrame) -> DataFrame:
    """Persist ``df``, releasing the PREVIOUS persisted frame under ``tag``
    within the same SparkSession — unless the previous frame has the SAME
    analyzed plan, in which case it is returned as-is (cache REUSE).

    DataFrame.persist pins the plan in the session CacheManager until an
    explicit unpersist — garbage collection never frees it — so a
    long-lived session calling a PQ operator repeatedly would accumulate
    one full reconstructed-index cache per call.  Rotating keeps at most
    ONE outstanding cache per operator family per session.

    The sameResult reuse matters for repeated identical calls (bench reps,
    a session re-running one query): a plain pinned ``persist`` gets this
    for free (the CacheManager dedupes identical plans — the pre-rotation
    behavior), and naive rotation would unpersist-then-recompute the very
    cache it could have reused, measured 2-4x on the SimHash64 bench
    family.  Caveat: plan equality over file sources reflects the files at
    read time — callers whose INPUT FILES mutate between calls must not
    share a tag (every current caller reads the immutable testdata or a
    frame derived from it)."""
    from pyspark import StorageLevel

    spark = df.sparkSession
    with _ACTIVE_CACHE_LOCK:
        per_session = _ACTIVE_CACHE.get(spark)
        if per_session is None:
            per_session = {}
            _ACTIVE_CACHE[spark] = per_session
        prev = per_session.get(tag)
        if prev is not None:
            try:
                # reuse only while the held frame is STILL cached: an
                # external spark.catalog.clearCache() (bench/stress
                # harnesses evict between queries) unpins it behind our
                # back, and returning an unpersisted frame would make the
                # caller's self-join recompute the subtree once per side
                still_cached = (
                    prev.storageLevel.useMemory or prev.storageLevel.useDisk
                )
                if still_cached and prev._jdf.queryExecution().analyzed().sameResult(
                    df._jdf.queryExecution().analyzed()
                ):
                    return prev
            except Exception:
                pass
        per_session.pop(tag, None)
        # Unpersist the displaced frame BEFORE persisting the new one.
        # Spark's CacheManager keys entries by plan equality, so when the
        # held frame was evicted externally (spark.catalog.clearCache()
        # between bench reps) and the incoming frame has the SAME plan,
        # persisting first and unpersisting after would destroy the entry
        # just created — the caller's self-join then recomputes the whole
        # fingerprint subtree once per side (measured 2.3 s/rep with the
        # cache vs 8.3 s/rep without on dedup_simhash_hamming).
        if prev is not None:
            try:
                prev.unpersist(False)
            except Exception:
                pass
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        per_session[tag] = out
    return out


def _reuse_rotating(tag: str, df: DataFrame) -> DataFrame:
    """Return the live rotating cache under ``tag`` when it plan-matches
    ``df``; otherwise return ``df`` UNPERSISTED and leave the registry
    untouched.  The read-only sibling of ``_persist_rotating`` for
    consumers whose standalone invocation is cheaper WITHOUT a cache but
    that should ride one a prefetch thread already materialized
    (measured on dedup_incremental_lsh at sf0.1: forcing the history
    band-key persist costs 2.43 s vs 2.06 s median un-persisted, while
    the warmed curation DAGs reuse the prefetched cache for free)."""
    spark = df.sparkSession
    with _ACTIVE_CACHE_LOCK:
        per_session = _ACTIVE_CACHE.get(spark)
        prev = per_session.get(tag) if per_session else None
        if prev is not None:
            try:
                still_cached = (
                    prev.storageLevel.useMemory or prev.storageLevel.useDisk
                )
                if still_cached and prev._jdf.queryExecution().analyzed().sameResult(
                    df._jdf.queryExecution().analyzed()
                ):
                    return prev
            except Exception:
                pass
    return df


# stage_checkpoint state: spark -> {tag: (source_df, checkpointed_df)}
_STAGE_CKPT: "_weakref.WeakKeyDictionary" = _weakref.WeakKeyDictionary()


def _ckpt_alive(ck: DataFrame) -> bool:
    """True while a localCheckpoint'ed frame's blocks are still persisted
    (the analyzed plan is a LogicalRDD whose stored RDD carries a storage
    level; an external unpersist — the bench harness evicts between
    queries — zeroes it, and a checkpointed RDD cannot recompute)."""
    try:
        rdd = ck._jdf.queryExecution().analyzed().rdd()
        lvl = rdd.getStorageLevel()
        return bool(lvl.useMemory() or lvl.useDisk())
    except Exception:
        return False


def stage_checkpoint(tag: str, df: DataFrame) -> DataFrame:
    """Eager ``localCheckpoint`` of a pipeline STAGE frame, rotating the
    previous checkpoint under ``tag`` — the lineage-truncation sibling of
    ``_persist_rotating`` for deep sequential DAGs.

    A multi-stage funnel whose every stage is merely ``persist``-ed keeps
    the FULL logical subtree in every downstream plan: each anti-join
    doubles the tree (survivor side + drop side both embed the upstream),
    so analysis, CacheManager lookups and per-call py4j traffic grow
    geometrically with stage count — measured 17.7 s of pure DataFrame
    CONSTRUCTION (no job) on the 7-stage all-modalities curation DAG at
    sf0.1, vs ~2 s of actual execution.  ``localCheckpoint(eager=True)``
    materializes the stage once and re-roots downstream plans on a
    LogicalRDD leaf, so every later stage plans against an O(stage)-size
    tree.  The rows are identical; only the plan shape changes.

    Reuse/rotation contract matches ``_persist_rotating``: an incoming
    frame whose analyzed plan ``sameResult``-matches the held source IS
    the held checkpoint (bench reps in an eviction-free session), while a
    new plan displaces the old checkpoint, whose blocks are explicitly
    unpersisted.  Liveness is probed through the LogicalRDD storage level
    because checkpoint blocks CANNOT be recomputed once dropped — a reused
    frame must still be resident.

    Cluster caveat (same as every ``localCheckpoint`` in this repo, e.g.
    the components iteration): blocks live in executor storage, so losing
    an executor fails the query instead of recomputing — acceptable for
    intra-query stage state; the job retry recomputes from source."""
    spark = df.sparkSession
    with _ACTIVE_CACHE_LOCK:
        per_session = _STAGE_CKPT.get(spark)
        if per_session is None:
            per_session = {}
            _STAGE_CKPT[spark] = per_session
        prev = per_session.get(tag)
        if prev is not None:
            src, ck = prev
            try:
                if _ckpt_alive(ck) and src._jdf.queryExecution().analyzed().sameResult(
                    df._jdf.queryExecution().analyzed()
                ):
                    return ck
            except Exception:
                pass
        per_session.pop(tag, None)
    # Materialize OUTSIDE the lock so INDEPENDENT stage builds submitted
    # from a driver thread pool genuinely overlap (guide §2.6 — the
    # incremental curation DAGs build their five history indexes
    # concurrently; holding the lock across the eager checkpoint would
    # serialize them).  Callers use distinct tags per call site; two
    # concurrent builds of the SAME tag would both materialize and the
    # later store wins (the loser's blocks stay until session end), which
    # no current caller does.
    if prev is not None:
        try:
            prev[1]._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass
    out = df.localCheckpoint(eager=True)
    # NOTE (r12, measured and deliberately NOT widened): AQE coalesces
    # a small stage's final shuffle to ONE partition and the checkpoint
    # freezes that width, so downstream projections run single-task at
    # bench scale.  Handing consumers a round-robin-widened view
    # (out.repartition(defaultParallelism) when narrower) was tried and
    # measured SLOWER end-to-end on both big curation DAGs at sf0.1
    # (corpus_curation_all_modalities 7.8 -> 11.9 s warm, the
    # incremental-multimodal DAG 6.6 -> 10.3 s): with only a few
    # thousand surviving rows per stage, 32 near-empty partitions cost
    # more in task/Arrow overhead across every consuming job than the
    # single-core projections they spread out.  At 100 TB the
    # coalesced width tracks data volume (AQE targets
    # advisoryPartitionSizeInBytes), so stages stay wide on their own.
    with _ACTIVE_CACHE_LOCK:
        per_session[tag] = (df, out)
    return out


def _pq_reconstruct(c: DataFrame, m: int, ksub: int, dsub: int) -> DataFrame:
    """PQ encode + decode: ``(corpus_id, v)`` -> ``(corpus_id, xhat)`` where
    xhat is the vector reconstructed from the nearest code per subspace.
    Codebook = the s-th subvectors of the ``ksub`` lowest-id vectors."""
    seeds = (
        c.orderBy("corpus_id")
        .limit(ksub)
        .select(
            "v",
            (
                F.row_number().over(Window.orderBy("corpus_id")) - F.lit(1)
            ).alias("code_id"),
        )
    )
    sub = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s")
    codebook = seeds.select("code_id", sub, "v").select(
        "s", "code_id", F.expr(f"slice(v, s * {dsub} + 1, {dsub})").alias("cv")
    ).withColumn("cc", V.dot(F.col("cv"), F.col("cv")))  # once per codeword

    corpus_sub = c.select("corpus_id", sub, "v").select(
        "corpus_id", "s", F.expr(f"slice(v, s * {dsub} + 1, {dsub})").alias("xv")
    ).withColumn("xx", V.dot(F.col("xv"), F.col("xv")))  # once per subvector
    # argmin_code L2²(xv, cv) = dot(xv,xv) - 2·dot(xv,cv) + dot(cv,cv):
    # fixed-order folds + fixed-shape arithmetic -> bit-identical distances
    # across engines, so the argmin (tie -> smaller code) agrees.  The two
    # self-dots are projected ONCE above instead of re-folded per
    # (subvector, codeword) pair — same values, one fold per pair.
    dist = (
        F.col("xx")
        - F.lit(2.0) * V.dot(F.col("xv"), F.col("cv"))
        + F.col("cc")
    )
    codes = (
        corpus_sub.join(F.broadcast(codebook), "s")
        .select("corpus_id", "s", "code_id", "cv", dist.alias("d"))
        .groupBy("corpus_id", "s")
        .agg(F.min_by("cv", F.struct(F.col("d"), F.col("code_id"))).alias("cv"))
    )
    return (
        codes.groupBy("corpus_id")
        .agg(F.array_sort(F.collect_list(F.struct("s", "cv"))).alias("scv"))
        .select(
            "corpus_id",
            F.flatten(F.transform("scv", lambda e: e.getField("cv"))).alias("xhat"),
        )
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    max_index_rows: int = MAX_BROADCAST_INDEX_ROWS,
) -> DataFrame:
    """Product-quantization approximate top-k (the memory-scale ANN path):
    each vector is split into ``m`` subvectors of ``dim/m`` components; per
    subspace a ``ksub``-entry codebook quantizes the subvector to its
    nearest code (L2, ties -> smaller code id), so a vector is stored as
    ``m`` small code ids — 8 bytes instead of 256 for a 64-d float vector,
    a 32x index-memory cut, which at 100 TB is what lets the index fit on
    the cluster at all (pair with IVF lists for IVF-PQ).

    Codebooks are DETERMINISTIC and oracle-checkable: subspace ``s``'s codes
    are the s-th subvectors of the ``ksub`` lowest-id corpus vectors (a real
    deployment swaps in trained codebooks; identical plumbing).  Scoring is
    asymmetric (ADC): the query stays exact and is scored against the
    RECONSTRUCTED corpus vector — dot(q, x̂) folds component-wise in element
    order, so Spark and DuckDB agree bit-for-bit (summing per-subspace
    lookup terms instead would change double rounding order).

    Scale shape: codebook is m*ksub*(dim/m) doubles — broadcast everywhere;
    encoding is one narrow pass over the corpus (crossJoin with the tiny
    broadcast codebook + per-(vector,subspace) min_by); scoring streams the
    code table against broadcast queries; final top-k is one k-rows-per-
    query shuffle."""
    import numpy as np
    import pandas as pd

    dsub = dim // m
    c = corpus.select(F.col(id_col).alias("corpus_id"), V.as_double(vec_col).alias("v"))
    q = queries.select(F.col(id_col).alias("query_id"), V.as_double(vec_col).alias("qv"))
    # persisted so the encode pipeline runs ONCE: the candidate-index collect
    # materializes the cache and the re-score join below reads it back —
    # exactly one driver transfer (the numpy candidate index), no
    # createDataFrame re-upload of the index.  Rotating persist: the prior
    # call's cache is released here (CacheManager pins persisted plans
    # until unpersist; GC alone never frees them).
    recon = _persist_rotating("pq_recon", _pq_reconstruct(c, m, ksub, dsub))

    # Scoring follows brute_force_topk_vectorized's two-stage shape: the
    # (tiny: m*ksub*dsub doubles per vector -> reconstructed) code table is
    # collected once and broadcast, queries stream partition-parallel doing
    # one BLAS matmul per Arrow batch and emitting only candidate ids; the
    # survivors are re-scored JVM-side with the same sequential fold the
    # oracle uses, so output stays bit-exact while the O(n_q*n_c) work is
    # BLAS.  In production the broadcast is the PQ *code* table (m bytes per
    # vector — the whole point), decoded against the codebook per batch.
    # Past the broadcast cap the operator DEGRADES instead of refusing
    # (mirror of ivf_pq_topk's distributed branch): the roles invert — the
    # query matrix is broadcast and the persisted coded table streams
    # partition-parallel, each Arrow batch doing one BLAS matmul and
    # emitting only its local top-k per query.  Per-batch top-k unions to a
    # superset of the global top-k (top-k is distributive), and the exact
    # JVM re-score + final window below restores the global ranking — no
    # unbounded collect, corpus never leaves the executors: the genuine
    # 100-TB shape for exhaustive ADC scans (standalone PQ *is* an
    # exhaustive scan over codes; IVF-PQ is the probe-limited variant).
    spark = corpus.sparkSession
    if _within_cap(recon, max_index_rows):
        rows = recon.collect()
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
        bc = spark.sparkContext.broadcast((ids, mat))

        def topk_ids(batches):
            c_ids, c_mat = bc.value
            for pdf in batches:
                q_ids = pdf["query_id"].to_numpy(dtype=np.int64)
                qm = np.array([list(v) for v in pdf["qv"]], dtype=np.float64)
                scores = qm @ c_mat.T  # raw asymmetric-distance dot, no normalize
                out_q, out_c = [], []
                for qi in range(len(q_ids)):
                    s = scores[qi]
                    mask = c_ids != q_ids[qi]
                    order = np.lexsort((c_ids[mask], -s[mask]))[:k]
                    out_q.extend([q_ids[qi]] * len(order))
                    out_c.extend(c_ids[mask][order])
                yield pd.DataFrame({"query_id": out_q, "corpus_id": out_c})

        cand = q.mapInPandas(topk_ids, "query_id long, corpus_id long")
    else:
        if not _within_cap(q, max_index_rows):
            recon.unpersist()
            raise ValueError(
                f"both PQ index and query set exceed {max_index_rows} rows; "
                "bound the query batch or pair with IVF lists (ivf_pq_topk)"
            )
        q_rows = q.collect()
        q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
        q_mat = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
        bcq = spark.sparkContext.broadcast((q_ids, q_mat))

        def batch_topk(batches):
            bq_ids, bq_mat = bcq.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                c_ids = pdf["corpus_id"].to_numpy(dtype=np.int64)
                c_mat = np.array([list(v) for v in pdf["xhat"]], dtype=np.float64)
                scores = bq_mat @ c_mat.T  # (n_q, batch_rows)
                out_q, out_c = [], []
                for qi in range(len(bq_ids)):
                    s = scores[qi]
                    mask = c_ids != bq_ids[qi]
                    order = np.lexsort((c_ids[mask], -s[mask]))[:k]
                    out_q.extend([bq_ids[qi]] * len(order))
                    out_c.extend(c_ids[mask][order])
                yield pd.DataFrame({"query_id": out_q, "corpus_id": out_c})

        # no dedup needed: each corpus row lives in exactly one Arrow batch,
        # so a (query, corpus) pair is emitted at most once
        cand = recon.mapInPandas(batch_topk, "query_id long, corpus_id long")
    scored = (
        cand.join(q, "query_id")
        .join(recon, "corpus_id")
        .select("query_id", "corpus_id", V.dot(F.col("qv"), F.col("xhat")).alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), "corpus_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "adc", "rank")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    max_index_rows: int = MAX_BROADCAST_INDEX_ROWS,
) -> DataFrame:
    """IVF-PQ — the production ANN index architecture at 100 TB: IVF limits
    WHICH vectors each query scores (probe ``n_probe`` of ``n_lists``
    inverted lists ≈ n_probe/n_lists of the corpus), PQ limits WHAT is
    stored per vector (m code bytes instead of dim floats, a 32x memory
    cut).  Compose both and a trillion-vector index fits a cluster and each
    query touches a bounded slice of it.

    Deterministic everywhere (lowest-id IVF seeds, lowest-id PQ codebooks,
    fixed-order folds), so the full pipeline is SQL-expressible: the DuckDB
    oracle replays assign -> encode -> probe -> ADC-score bit-for-bit.

    Scale shape: centroids and codebooks broadcast; corpus makes one
    narrow pass for assignment + one for encoding; candidates shuffle on
    list_id; final top-k is k rows per query."""
    c = corpus.select(F.col(id_col).alias("corpus_id"), V.as_double(vec_col).alias("v"))
    q = queries.select(F.col(id_col).alias("query_id"), V.as_double(vec_col).alias("qv"))

    cents = (
        c.orderBy("corpus_id")
        .limit(n_lists)
        .select(F.col("corpus_id").alias("cid"), F.col("v").alias("cv"))
    )
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .select("corpus_id", "cid", V.cosine(F.col("v"), F.col("cv")).alias("cc"))
        .groupBy("corpus_id")
        .agg(
            F.max_by("cid", F.struct(F.col("cc"), (-F.col("cid")).alias("n"))).alias(
                "list_id"
            )
        )
    )
    recon = _pq_reconstruct(c, m, ksub, dim // m)
    coded = assigned.join(recon, "corpus_id")

    scored_q = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "cid", V.cosine(F.col("qv"), F.col("cv")).alias("qc")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("qc"), "cid")
    probes = (
        scored_q.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", F.col("cid").alias("list_id"))
    )

    # BLAS-select within probed lists + exact fold re-score (the same
    # two-stage shape as pq_topk/brute_force_topk_vectorized): the coded
    # index (id, list_id, reconstructed vector) is persisted, the candidate-
    # selection copy is collected once — cap-bounded — and broadcast; each
    # Arrow batch of (query, probed lists) does one masked matmul emitting
    # candidate ids only.  The re-score join reads the PERSISTED index (no
    # createDataFrame re-upload — assign+encode run once, one driver
    # transfer total).  Past the cap the operator degrades to the fully
    # distributed path: candidates co-partitioned with the index by a
    # shuffle join on list_id (each reducer effectively holds only its
    # lists' shard), scored exactly JVM-side — no broadcast, no collect,
    # the genuine 100-TB shape.
    import numpy as np
    import pandas as pd

    coded = _persist_rotating(
        "ivfpq_coded", coded.select("corpus_id", "list_id", "xhat")
    )
    if not _within_cap(coded, max_index_rows):
        cand = probes.join(coded, "list_id").filter(
            F.col("query_id") != F.col("corpus_id")
        )
        scored = cand.select(
            "query_id",
            "corpus_id",
            V.dot(F.col("qv"), F.col("xhat")).alias("adc"),
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("adc"), "corpus_id")
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "corpus_id", "adc", "rank")
        )
    rows = coded.collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    lists = np.array([r[1] for r in rows], dtype=np.int64)
    mat = np.array([list(r[2]) for r in rows], dtype=np.float64)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((ids, lists, mat))

    per_query = probes.groupBy("query_id", "qv").agg(
        F.collect_list("list_id").alias("probe_lists")
    )

    def topk_ids(batches):
        c_ids, c_lists, c_mat = bc.value
        for pdf in batches:
            out_q, out_c = [], []
            for qid, qv, plists in zip(
                pdf["query_id"], pdf["qv"], pdf["probe_lists"]
            ):
                mask = np.isin(c_lists, np.asarray(list(plists), dtype=np.int64))
                mask &= c_ids != int(qid)
                if not mask.any():
                    continue
                s = np.asarray(list(qv), dtype=np.float64) @ c_mat[mask].T
                order = np.lexsort((c_ids[mask], -s))[:k]
                out_q.extend([int(qid)] * len(order))
                out_c.extend(c_ids[mask][order])
            yield pd.DataFrame({"query_id": out_q, "corpus_id": out_c})

    cand = per_query.mapInPandas(topk_ids, "query_id long, corpus_id long")
    scored = (
        cand.join(q, "query_id")
        .join(coded.select("corpus_id", "xhat"), "corpus_id")
        .select("query_id", "corpus_id", V.dot(F.col("qv"), F.col("xhat")).alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), "corpus_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "adc", "rank")
    )


_HEX_HI = ("8", "9", "a", "b", "c", "d", "e", "f")


def _hyperplane_sign(vec, plane: int, dim: int):
    """Sign bit of <v, h_plane> with pseudo-random ±1 plane components derived
    from md5 parity — deterministic, model-free, and md5 is available in both
    Spark and DuckDB, so the whole bucketing is oracle-checkable in SQL."""
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.when(
            F.substring(
                F.md5(F.concat(F.lit(f"{plane}:"), j.cast("string"))), 1, 1
            ).isin(*_HEX_HI),
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)),
    )
    return F.when(V.dot(vec, comp) >= 0, F.lit("1")).otherwise(F.lit("0"))


def lsh_signature(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: int = 8,
    dim: int = 64,
    plane_offset: int = 0,
) -> DataFrame:
    """``plane_offset`` selects an independent plane set (table t uses
    offset t*planes): the md5-derived plane components depend only on the
    global plane index, so disjoint index ranges give statistically
    independent hash tables for multi-probe."""
    v = V.as_double(vec_col)
    sig = F.concat(
        *[_hyperplane_sign(v, plane_offset + p, dim) for p in range(planes)]
    )
    return df.select(F.col(id_col), sig.alias("bucket"))


def auto_planes(n_rows: int, target_bucket_rows: int = 256, floor: int = 4) -> int:
    """Plane count that holds expected bucket occupancy at ``target_bucket_rows``
    as the corpus grows: ``floor + ceil(log2(n / target))`` (and never below
    ``floor``; corpora at or under ``target`` rows get exactly ``floor``).
    The additive ``floor`` term is intentional — it keeps small-corpus
    signatures non-degenerate while still doubling the bucket space with
    every doubling of n (tests and the ann_lsh_adaptive oracle pin it).

    With a FIXED plane count the bucket space (2^planes) is constant, so
    occupancy — and within-bucket pairwise work — grows linearly with n and
    total work grows ~n².  Holding occupancy constant instead makes the
    pairwise stage O(n * target) ~ linear.  Measured in tools/scale_stress.py:
    at 10x the corpus, fixed 4-plane LSH scales with exponent 1.34 while this
    policy stays at 0.24 (see SCALING.md).  The cost of more planes is recall on
    borderline pairs — production sweeps multi-probe tables (several
    independent plane sets) to buy recall back, which multiplies work by the
    table count, not n."""
    import math as _math

    if n_rows <= target_bucket_rows:
        return floor
    return max(floor, _math.ceil(_math.log2(n_rows / target_bucket_rows)) + floor)


def lsh_bucketed_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int | str = 4,
    dim: int = 64,
    threshold: float = 0.3,
) -> DataFrame:
    """All-pairs cosine >= threshold, candidate-limited to same LSH bucket.

    ``planes="auto"`` sizes the signature from the corpus row count via
    ``auto_planes`` (one cheap count() action — parquet metadata at scale)."""
    if planes == "auto":
        planes = auto_planes(df.count())
    return _bucket_pairs(df, id_col, vec_col, planes, dim, threshold, 0)


def _bucket_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: int,
    dim: int,
    threshold: float,
    plane_offset: int,
) -> DataFrame:
    from kwack_spark.operators.scale import widen_if_narrow

    # signature projection (per-row plane dots) must not run single-task
    # when the scan is one split (local bench); no-op on real multi-split
    # sources
    df = widen_if_narrow(df)
    # per-VECTOR norm is computed once here, not re-folded per PAIR: the
    # pair stage then runs ONE array fold (the dot) instead of three.
    # sqrt(dot(v,v)) evaluated early is the identical IEEE value the
    # inline cosine would produce, so results stay bit-exact.
    base = df.select(
        F.col(id_col), V.as_double(vec_col).alias("v")
    ).withColumn("nv", V.norm(F.col("v")))
    sig = lsh_signature(df, id_col, vec_col, planes, dim, plane_offset)
    t = base.join(sig, id_col)
    a, b = t.alias("a"), t.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (V.dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nv") * F.col("b.nv"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def lsh_multitable_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 4,
    dim: int = 64,
    threshold: float = 0.3,
    n_tables: int = 2,
) -> DataFrame:
    """Multi-table LSH near-neighbor pairs: the union of
    ``lsh_bucketed_pairs`` over ``n_tables`` INDEPENDENT plane sets (table
    t hashes with plane indices [t*planes, (t+1)*planes)).

    This is the standard recall lever for hashing-based ANN: a true pair
    whose cosine puts per-plane agreement probability at p survives one
    table with probability p^planes but at least one of T tables with
    1-(1-p^planes)^T — recall lost to narrower buckets (more planes, the
    occupancy lever) is bought back with more tables.

    Scale shape: work and shuffles scale with T — T bucket-key shuffles
    plus one distinct-shuffle to merge the tables' pair sets — and stay
    LINEAR in n (each table inherits lsh_bucketed_pairs' occupancy bound).
    Cosine is computed identically in every table, so the merge is a set
    union of identical rows, not a re-score."""
    parts = [
        _bucket_pairs(df, id_col, vec_col, planes, dim, threshold, t * planes)
        for t in range(n_tables)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.distinct()


def lsh_bucketed_pairs_adaptive(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.3,
    target_bucket_rows: int = 256,
    max_planes: int = 12,
) -> DataFrame:
    """``lsh_bucketed_pairs`` with the ``auto_planes`` policy applied WITHOUT
    a driver action: every vector's signature is computed at ``max_planes``
    width and truncated to the policy's width inside the plan — the corpus
    count arrives as a broadcast 1-row aggregate, so the whole operator is a
    single declarative job (and oracle-expressible in SQL, unlike the
    ``planes="auto"`` path whose count() runs driver-side first).

    Signature-prefix truncation is exactly plane-subset bucketing: plane p's
    bit is independent of the others, so ``substr(sig, 1, k)`` equals the
    k-plane signature.  At 2x the corpus the truncation keeps one more bit —
    bucket occupancy, and therefore within-bucket pairwise work per row,
    stays at ~``target_bucket_rows`` as the data grows (measured: exponent
    0.24 vs 1.34 fixed-width, SCALING.md).

    ``max_planes`` bounds the policy: capacity is ``target_bucket_rows *
    2**(max_planes - 4)`` rows (12 planes -> 65k at the defaults), beyond
    which occupancy grows linearly again — the fixed-width trap this
    operator exists to avoid.  Size it for the corpus: each extra plane
    costs one dot product per vector (linear), so 24 planes (~268M rows)
    or 32 (~68B) are cheap insurance at scale.  The registered
    ``ann_lsh_adaptive`` query pins 12 to match its DuckDB oracle's
    generated signature."""
    base = df.select(
        F.col(id_col), V.as_double(vec_col).alias("v")
    ).withColumn("nv", V.norm(F.col("v")))  # once per vector, not per pair
    sig = lsh_signature(df, id_col, vec_col, max_planes, dim)
    n1 = df.select(F.count(F.lit(1)).alias("__n"))
    floor_, tgt = 4, target_bucket_rows
    planes_col = F.when(F.col("__n") <= tgt, F.lit(floor_)).otherwise(
        F.greatest(
            F.lit(floor_),
            F.ceil(F.log2(F.col("__n") / F.lit(float(tgt)))).cast("int") + floor_,
        )
    )
    t = (
        base.join(sig, id_col)
        .crossJoin(F.broadcast(n1))
        .withColumn("bucket", F.col("bucket").substr(F.lit(1), planes_col))
        .drop("__n")
    )
    a, b = t.alias("a"), t.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (V.dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nv") * F.col("b.nv"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_dup_keepers(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 4,
    dim: int = 64,
    threshold: float = 0.35,
) -> DataFrame:
    """Embedding-cosine near-duplicate resolution: every vector that has an
    LSH-bucket neighbor with a smaller id and cosine >= threshold is a
    duplicate; its keeper is the LOWEST-id such neighbor.  Output is one row
    per duplicate: (dup_id, keep_id, cosine-to-keeper).

    Scale shape: inherits lsh_bucketed_pairs (one shuffle on bucket signature,
    within-bucket candidates only — never all-pairs), then a partial-aggregated
    groupBy on dup_id whose output is at most one row per input vector.  The
    min-id keeper rule is deterministic without global connected components —
    the right trade at 100 TB, where transitive-closure dedup needs an
    iterative algorithm (see operators/dedup.py for the text-side analogue).
    """
    pairs = lsh_bucketed_pairs(df, id_col, vec_col, planes, dim, threshold)
    return (
        pairs.groupBy(F.col("id_b").alias("dup_id"))
        .agg(
            F.min("id_a").alias("keep_id"),
            F.min_by("cosine", "id_a").alias("cosine"),
        )
    )
