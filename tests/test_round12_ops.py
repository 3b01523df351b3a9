"""Round-12 unit tests: DECIMAL(38,0) mixture-reweight arithmetic at
100-TB magnitudes (r11 VERDICT what's-wrong #1 / next #1), the MinHash
band-df cap's oracle parity + over-cap star-edge recovery (r11 ADVICE
medium), and Bloom paragraph dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# mixture_reweight_step arithmetic at 100-TB magnitudes
# ---------------------------------------------------------------------------


def test_reweight_update_exact_at_100tb_magnitudes(spark):
    """The DoReMi update must stay EXACT when 1e6·s_chars·n_all ≈ 1e31 —
    far past int64 (9.2e18), where the pre-r12 BIGINT form wrapped
    silently.  Fixture: two domains at the advertised 100-TB shape
    (s_all = 1e14 chars, n_all = 1e11 docs); expectations are Python
    bigints, which cannot overflow."""
    from kwack_spark.plans.pipeline_curation import _reweight_from_domains

    n_a, s_a = 40_000_000_000, 60_000_000_000_000   # 4e10 docs, 6e13 chars
    n_b, s_b = 60_000_000_000, 40_000_000_000_000   # 6e10 docs, 4e13 chars
    dom = spark.createDataFrame(
        [("a", n_a, s_a), ("b", n_b, s_b)],
        "lang string, n_docs long, s_chars long",
    )
    n_all, s_all = n_a + n_b, s_a + s_b
    ppm_a = (1_000_000 * s_a * n_all) // (s_all * n_a)   # 1_500_000
    ppm_b = (1_000_000 * s_b * n_all) // (s_all * n_b)   # 666_666
    u_a, u_b = (3_000_000 + ppm_a) // 4, (3_000_000 + ppm_b) // 4
    rows = {r.lang: r for r in _reweight_from_domains(dom).collect()}
    assert rows["a"].loss_ppm == ppm_a == 1_500_000
    assert rows["b"].loss_ppm == ppm_b == 666_666
    assert rows["a"].w_after == pytest.approx(u_a / (u_a + u_b), abs=1e-12)
    assert rows["b"].w_after == pytest.approx(u_b / (u_a + u_b), abs=1e-12)
    assert rows["a"].w_before == pytest.approx(0.5)


def test_reweight_update_matches_duckdb_hugeint_oracle(spark):
    """Same fixture through the oracle's HUGEINT arithmetic: the DuckDB //
    and Spark div forms must agree digit-for-digit past int64."""
    import duckdb

    from kwack_spark.plans.pipeline_curation import _reweight_from_domains

    dom_rows = [("a", 40_000_000_000, 60_000_000_000_000),
                ("b", 35_000_000_000, 23_000_000_000_001),
                ("c", 25_000_000_000, 17_000_000_000_007)]
    dom = spark.createDataFrame(
        dom_rows, "lang string, n_docs long, s_chars long"
    )
    got = {
        r.lang: (r.loss_ppm, r.w_after)
        for r in _reweight_from_domains(dom).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d(lang VARCHAR, n_docs BIGINT, s_chars BIGINT)"
    )
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", dom_rows)
    exp = con.execute(
        """
        WITH tot AS (
            SELECT CAST(sum(n_docs) AS BIGINT) AS n_all,
                   CAST(sum(s_chars) AS BIGINT) AS s_all,
                   CAST(count(*) AS BIGINT) AS n_domains
            FROM d
        ),
        u AS (
            SELECT lang,
                   (CAST(1000000 AS HUGEINT) * s_chars * n_all)
                       // (CAST(s_all AS HUGEINT) * n_docs) AS loss_ppm,
                   (3000000 + (CAST(1000000 AS HUGEINT) * s_chars * n_all)
                              // (CAST(s_all AS HUGEINT) * n_docs)) // 4 AS u_d
            FROM d CROSS JOIN tot
        )
        SELECT lang, CAST(loss_ppm AS BIGINT),
               CAST(u_d AS DOUBLE) / (SELECT sum(u_d) FROM u)
        FROM u
        """
    ).fetchall()
    con.close()
    for lang, ppm, w in exp:
        assert got[lang][0] == ppm
        assert got[lang][1] == pytest.approx(w, abs=1e-12)
