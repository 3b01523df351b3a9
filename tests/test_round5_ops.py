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
