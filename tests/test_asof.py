"""As-of join unit tests: backward/forward direction, equal-timestamp
inclusivity, no-match nulls, multi-key isolation — the semantics DuckDB's
native ASOF JOIN defines (the registered query cross-checks against it; these
pin the edges directly)."""

import pytest
from pyspark.sql import functions as F

from kwack_spark.operators.asof import asof_join_backward, asof_join_forward


def _dfs(spark):
    left = spark.createDataFrame(
        [("a", 10, "L1"), ("a", 20, "L2"), ("a", 5, "L0"), ("b", 15, "L3")],
        "k string, ts long, lv string",
    ).selectExpr("k AS key", "ts", "lv")
    right = spark.createDataFrame(
        [("a", 10, "R10"), ("a", 18, "R18"), ("b", 99, "R99")],
        "k string, ts long, rv string",
    ).selectExpr("k AS key", "ts", "rv")
    return left, right


def test_backward_semantics(spark):
    left, right = _dfs(spark)
    out = asof_join_backward(
        left, right, key="key", left_ts="ts", right_ts="ts",
        right_vals=["rv"], left_vals=["lv"],
    )
    got = {r.l_lv: r.r_rv for r in out.collect()}
    assert got == {
        "L0": None,   # ts=5: no right row at or before
        "L1": "R10",  # ts=10: equal timestamp included (>=)
        "L2": "R18",  # ts=20: most recent preceding
        "L3": None,   # key b: right row is in the future
    }
    assert out.count() == 4  # every left row survives (left join)


def test_forward_semantics(spark):
    left, right = _dfs(spark)
    out = asof_join_forward(
        left, right, key="key", left_ts="ts", right_ts="ts",
        right_vals=["rv"], left_vals=["lv"],
    )
    got = {r.l_lv: r.r_rv for r in out.collect()}
    assert got == {
        "L0": "R10",  # ts=5: earliest following
        "L1": "R10",  # ts=10: equal timestamp included (<=... >=)
        "L2": None,   # ts=20: nothing after
        "L3": "R99",  # key b: future row attaches forward
    }


def test_single_shuffle_plan(spark):
    left, right = _dfs(spark)
    out = asof_join_backward(
        left, right, key="key", left_ts="ts", right_ts="ts",
        right_vals=["rv"], left_vals=["lv"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1  # the union-merge shuffle
    assert "Join" not in plan  # no join operator at all


def test_band_join_equals_theta_join_with_boundaries(spark):
    """band_join == naive theta join, including deltas exactly at the
    bounds and pairs straddling bucket boundaries."""
    from kwack_spark.operators.rangejoin import band_join

    left = spark.createDataFrame(
        [(1, 0), (1, 100), (1, 1000), (2, 500), (2, 1999), (3, 42)],
        "k int, lts long",
    )
    right = spark.createDataFrame(
        # deltas vs left include: exact lower bound (0), exact upper bound
        # (900), just outside (901), negative, and cross-bucket pairs
        [(1, 0), (1, 100), (1, 901), (1, 99), (2, 1099), (2, 1998), (3, 950)],
        "k int, rts long",
    )
    got = band_join(left, right, ["k"], "lts", "rts", 0, 900)
    naive = left.join(right, "k").where(
        (F.col("lts") - F.col("rts") >= 0) & (F.col("lts") - F.col("rts") <= 900)
    )
    key = lambda r: (r["k"], r["lts"], r["rts"])
    assert sorted(map(key, got.collect())) == sorted(map(key, naive.collect()))
    assert got.count() > 0


def test_band_join_rejects_outer(spark):
    from kwack_spark.operators.rangejoin import band_join

    df = spark.createDataFrame([(1, 1)], "k int, t long")
    with pytest.raises(ValueError, match="inner"):
        band_join(df, df.withColumnRenamed("t", "t2"), ["k"], "t", "t2", 0, 10, how="left")


def test_band_join_epoch_micros_magnitude(spark):
    """Bucket assignment stays exact at epoch-micros magnitude (~1.7e15),
    where naive double-division floor can misplace boundary values."""
    from kwack_spark.operators.rangejoin import band_join

    base = 1_755_000_000_000_000  # ~2025 in epoch micros
    band = 1_800_000_000  # 30 min
    # right values at exact bucket boundaries and band edges around base
    left = spark.createDataFrame(
        [(1, base), (1, base + band), (1, base + 7 * band + 1)], "k int, lts long"
    )
    right = spark.createDataFrame(
        [(1, base), (1, base - band), (1, base + 1), (1, base + band), (1, base + 6 * band + 1)],
        "k int, rts long",
    )
    got = band_join(left, right, ["k"], "lts", "rts", 0, band)
    naive = left.join(right, "k").where(
        (F.col("lts") - F.col("rts") >= 0) & (F.col("lts") - F.col("rts") <= band)
    )
    key = lambda r: (r["k"], r["lts"], r["rts"])
    assert sorted(map(key, got.collect())) == sorted(map(key, naive.collect()))
    assert got.count() >= 4


def test_asof_nearest_tie_goes_backward(spark):
    """Equidistant before/after candidates resolve to the BACKWARD row;
    one-sided rows resolve to whichever side exists; no candidate -> NULL."""
    import datetime as dt

    from kwack_spark.operators import asof

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    left = spark.createDataFrame(
        [(1, s(100), 10), (2, s(100), 20), (3, s(100), 30), (4, s(100), 40)],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [
            (1, s(90), 91), (1, s(110), 111),   # tie -> backward (91)
            (2, s(150), 201),                    # only forward
            (3, s(10), 301),                     # only backward
        ],
        "k long, ts timestamp, rid long",
    )
    out = {
        r.l_lid: (r.r_rid, r.asof_dir)
        for r in asof.asof_join_nearest(
            left, right, key="k", left_ts="ts", right_ts="ts",
            right_vals=["rid", "ts"], left_vals=["lid"], right_ts_val="ts",
        ).collect()
    }
    assert out[10] == (91, "backward")
    assert out[20] == (201, "forward")
    assert out[30] == (301, "backward")
    assert out[40] == (None, None)


def test_asof_atomic_row_selection_with_null_right_vals(spark):
    """Nullable right_vals columns must never blend across rows: the fill
    is struct-atomic, so every returned right column (and the nearest
    variant's tie-break timestamp) comes from the SAME right row (r05
    ADVICE — per-column last/first(ignorenulls) mixed rows)."""
    import datetime as dt

    from kwack_spark.operators import asof

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    left = spark.createDataFrame(
        [(1, s(100), 10)], "k long, ts timestamp, lid long"
    )
    # older row has tag but null val; nearest/most-recent row has val but
    # null tag — a per-column fill would return (val=V18, tag=T10)
    right = spark.createDataFrame(
        [(1, s(10), None, "T10"), (1, s(90), "V18", None)],
        "k long, ts timestamp, val string, tag string",
    )
    row = asof.asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="ts",
        right_vals=["val", "tag"], left_vals=["lid"],
    ).collect()[0]
    assert (row.r_val, row.r_tag) == ("V18", None)

    row = asof.asof_join_forward(
        right.selectExpr("k", "ts", "1 as lid").limit(0).unionByName(left),
        right, key="k", left_ts="ts", right_ts="ts",
        right_vals=["val", "tag"], left_vals=["lid"],
    ).collect()[0]
    assert (row.r_val, row.r_tag) == (None, None)  # nothing at/after s(100)

    row = asof.asof_join_nearest(
        left, right, key="k", left_ts="ts", right_ts="ts",
        right_vals=["ts", "val", "tag"], left_vals=["lid"], right_ts_val="ts",
    ).collect()[0]
    assert (row.r_val, row.r_tag, row.asof_dir) == ("V18", None, "backward")
