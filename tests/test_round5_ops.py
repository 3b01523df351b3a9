"""Round-5 edge-behavior pins.

- text_token_stats: zero-token document (driver-red in r04 — the oracle's
  HUGEINT list_sum and the latent ANSI divide-by-zero).  Reference test
  style: golden rows on a tiny fixture (AbstractSchemaTest.java).
- ANN beyond-cap probes must not collect vector columns (round-4 VERDICT
  item 4): beyond-cap tables trigger the distributed branch off an id-only
  count, outputs unchanged.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kwack_spark.plans.registry import QUERIES, _load_all

_load_all()


def _write_documents(tmp_path, rows):
    cols = {
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    }
    pq.write_table(pa.table(cols), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


DOCS = [
    (1, "The quick brown fox", "en", "web"),
    (2, "1234 !!! ???", "en", "web"),  # normalizes to no tokens at all
    (3, "", "en", "web"),  # empty text
    (4, "spark spark spark", "en", "web"),
]


def test_text_token_stats_zero_token_doc(spark, tmp_path):
    """Zero-token docs yield NULL ttr / NULL total_tok_chars (matching
    DuckDB: 0/0 -> NULL, list_sum([]) -> NULL) and must not raise under
    Spark 4's default ANSI mode (DIVIDE_BY_ZERO)."""
    sf_dir = _write_documents(tmp_path, DOCS)
    out = {r.doc_id: r for r in QUERIES["text_token_stats"].fn(spark, sf_dir).collect()}
    assert out[1].n_tokens == 4
    assert out[1].ttr == 1.0
    assert out[1].total_tok_chars == 16
    for zid in (2, 3):
        assert out[zid].n_tokens == 0
        assert out[zid].ttr is None
        assert out[zid].total_tok_chars is None
    assert out[4].n_tokens == 3
    assert out[4].ttr == pytest.approx(1 / 3)
    # long-typed aggregate (oracle side casts HUGEINT -> BIGINT to match)
    field = {f.name: f for f in QUERIES["text_token_stats"].fn(spark, sf_dir).schema}
    assert field["total_tok_chars"].dataType.simpleString() == "bigint"


def test_text_token_stats_matches_oracle_on_fixture(spark, tmp_path):
    """Bit-strict local compare on the synthetic fixture, including the
    zero-token rows the shipped testdata doesn't contain."""
    import duckdb

    from tests.oracle_harness import compare_query

    sf_dir = _write_documents(tmp_path, DOCS)
    con = duckdb.connect()
    con.execute(
        f"CREATE OR REPLACE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    e = QUERIES["text_token_stats"]
    ok, detail = compare_query(spark, con, e.fn, e.oracle, sf_dir)
    assert ok, detail


def _spy_collects(monkeypatch):
    """Record (schema, n_rows) of every DataFrame.collect() call.  Patches
    the CONCRETE classic DataFrame — in Spark 4 the pyspark.sql.DataFrame
    facade's collect is overridden there, so patching the base is a no-op."""
    from pyspark.sql.classic.dataframe import DataFrame

    calls = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        calls.append((self.schema.simpleString(), len(rows)))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    return calls


def _vectors(spark, n, dim=8, prefix=0):
    import random

    rng = random.Random(42 + prefix)
    rows = [(prefix + i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_beyond_cap_probes_without_vector_collect(
    spark, monkeypatch
):
    """Beyond-cap corpus: the cap probe is an id-only count — no collect of
    cap+1 vector-bearing corpus rows; the only vector collect is the
    (under-cap) query batch.  Outputs identical to the broadcast branch."""
    from kwack_spark.operators import similarity

    corpus = _vectors(spark, 30)
    queries = _vectors(spark, 4, prefix=1000)
    want = sorted(
        map(tuple, similarity.brute_force_topk_vectorized(
            corpus, queries, k=3, max_index_rows=10_000).collect())
    )
    calls = _spy_collects(monkeypatch)
    got = sorted(
        map(tuple, similarity.brute_force_topk_vectorized(
            corpus, queries, k=3, max_index_rows=10).collect())
    )
    assert got == want
    # every vector-bearing collect is cap-bounded (the query batch);
    # the 30-row corpus is never collected
    vec_calls = [c for c in calls if "array" in c[0]]
    assert vec_calls and all(n <= 10 for _, n in vec_calls)


def test_brute_force_both_beyond_cap_raises_with_zero_collects(
    spark, monkeypatch
):
    import pytest

    from kwack_spark.operators import similarity

    corpus = _vectors(spark, 12)
    queries = _vectors(spark, 12, prefix=1000)
    calls = _spy_collects(monkeypatch)
    with pytest.raises(ValueError, match="both corpus and query set exceed"):
        similarity.brute_force_topk_vectorized(
            corpus, queries, k=2, max_index_rows=5
        )
    assert calls == []  # id-only count probes, nothing shipped to the driver


def test_pq_beyond_cap_probes_without_vector_collect(spark, monkeypatch):
    """pq_topk's distributed branch: same invariant — the coded table is
    probed by id count, only the query batch's vectors are collected."""
    from kwack_spark.operators import similarity

    corpus = _vectors(spark, 24, dim=16)
    queries = _vectors(spark, 4, dim=16, prefix=1000)
    want = sorted(
        (r.query_id, r.corpus_id, r.rank)
        for r in similarity.pq_topk(
            corpus, queries, k=3, m=4, ksub=8, dim=16, max_index_rows=10_000
        ).collect()
    )
    calls = _spy_collects(monkeypatch)
    got = sorted(
        (r.query_id, r.corpus_id, r.rank)
        for r in similarity.pq_topk(
            corpus, queries, k=3, m=4, ksub=8, dim=16, max_index_rows=8
        ).collect()
    )
    assert got == want
    vec_calls = [(s, n) for s, n in calls if "array" in s and n > 8]
    assert vec_calls == []
