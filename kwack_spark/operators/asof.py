"""As-of join (time-nearest, backward) — DuckDB has ASOF JOIN natively
(SURVEY.md §2.B flags it as the one relational gap); Spark does not.

Implementation is the union-merge pattern, NOT a range cross-join:

    union(left tagged 1, right tagged 0)
      -> window partitionBy(key) orderBy(ts, side)   [one shuffle on key]
      -> last(struct(right cols), ignoreNulls) over rows unboundedPreceding..current
      -> keep left rows

Cost is a single shuffle + sort per key group — linear in |L|+|R| per key,
versus the quadratic blow-up of `L.join(R, R.ts <= L.ts)` + argmax.  This is
the plan that survives 100× scale-up: skewed keys are split by AQE, and no
row ever fans out.

The right-side payload travels as ONE struct column (null on left rows,
non-null on right rows even when every field inside is null), so the window
fill always selects all right columns — and the tie-break timestamp —
atomically from the SAME right row.  Filling each column independently with
last/first(ignorenulls) would blend values from different right rows when
any right_vals column is nullable (r05 ADVICE).

Tie semantics: right rows sort before left at equal ts => backward-inclusive
(matches DuckDB ASOF JOIN's l.ts >= r.ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as ST
from pyspark.sql.window import Window


def _rv_struct(right: DataFrame, right_vals: list[str]):
    """The right payload as one struct column (built on the right side
    BEFORE the union, so it is null-vs-present per ROW, not per field)."""
    return F.struct(*[F.col(c).alias(c) for c in right_vals])


def _rv_null(right: DataFrame, right_vals: list[str]):
    """Typed all-null placeholder for left rows in the union."""
    st = ST.StructType(
        [ST.StructField(c, right.schema[c].dataType) for c in right_vals]
    )
    return F.lit(None).cast(st)


def _merge(left, right, key, left_ts, right_ts, right_vals, left_vals):
    r = right.select(
        F.col(key).alias("k"),
        F.col(right_ts).alias("t"),
        F.lit(0).alias("side"),
        _rv_struct(right, right_vals).alias("rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"l_{c}") for c in left_vals],
    )
    l = left.select(
        F.col(key).alias("k"),
        F.col(left_ts).alias("t"),
        F.lit(1).alias("side"),
        _rv_null(right, right_vals).alias("rv"),
        *[F.col(c).alias(f"l_{c}") for c in left_vals],
    )
    return r.unionByName(l)


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    left_vals: list[str],
) -> DataFrame:
    """For each left row, attach the most recent right row (same key,
    right_ts <= left_ts).  right must be unique per (key, right_ts);
    right_vals columns may be null — row selection is atomic."""
    merged = _merge(left, right, key, left_ts, right_ts, right_vals, left_vals)
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.select(
        "k",
        "t",
        "side",
        *[F.col(f"l_{c}") for c in left_vals],
        F.last("rv", ignorenulls=True).over(w).alias("rv"),
    )
    return filled.filter(F.col("side") == 1).select(
        "k",
        "t",
        *[F.col(f"l_{c}") for c in left_vals],
        *[F.col(f"rv.{c}").alias(f"r_{c}") for c in right_vals],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    left_vals: list[str],
) -> DataFrame:
    """For each left row, attach the EARLIEST right row at or after it
    (same key, right_ts >= left_ts) — the forward twin of
    asof_join_backward; same single-shuffle union-merge plan, with the
    window scanning following rows instead of preceding ones."""
    merged = _merge(left, right, key, left_ts, right_ts, right_vals, left_vals)
    # right rows sort after left at equal ts via descending side, and the
    # frame looks forward: first following non-null right row
    w = (
        Window.partitionBy("k")
        .orderBy("t", F.desc("side"))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    filled = merged.select(
        "k",
        "t",
        "side",
        *[F.col(f"l_{c}") for c in left_vals],
        F.first("rv", ignorenulls=True).over(w).alias("rv"),
    )
    return filled.filter(F.col("side") == 1).select(
        "k",
        "t",
        *[F.col(f"l_{c}") for c in left_vals],
        *[F.col(f"rv.{c}").alias(f"r_{c}") for c in right_vals],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    left_vals: list[str],
    right_ts_val: str = "ts",
) -> DataFrame:
    """For each left row, attach the right row NEAREST in time (either
    direction, same key); equidistant candidates resolve to the BACKWARD
    one.  Composes the backward and forward fills over ONE union-merge
    sort (same single shuffle as the directional variants — the two window
    frames share the (t, side) ordering, so Catalyst plans one sort).
    ``right_ts_val`` names the right_vals entry carrying the right
    timestamp; because the fill is struct-atomic, the distance compare and
    the returned columns are guaranteed to come from the same candidate
    row in each direction.  Timestamps compare in integer microseconds —
    exact."""
    merged = _merge(left, right, key, left_ts, right_ts, right_vals, left_vals)
    # right rows sort before left at equal t: the backward frame includes
    # an equal-t right (distance 0, and backward wins ties anyway), the
    # forward frame sees only STRICTLY-later rights — which never changes
    # the chosen row, because a distance-0 backward match always wins.
    w_b = (
        Window.partitionBy("k")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_f = (
        Window.partitionBy("k")
        .orderBy("t", "side")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    filled = merged.select(
        "k",
        "t",
        "side",
        *[F.col(f"l_{c}") for c in left_vals],
        F.last("rv", ignorenulls=True).over(w_b).alias("bv"),
        F.first("rv", ignorenulls=True).over(w_f).alias("fv"),
    ).filter(F.col("side") == 1)
    bt = F.col(f"bv.{right_ts_val}")
    ft = F.col(f"fv.{right_ts_val}")
    choose_b = F.col("bv").isNotNull() & (
        F.col("fv").isNull()
        | (
            (F.unix_micros(F.col("t")) - F.unix_micros(bt))
            <= (F.unix_micros(ft) - F.unix_micros(F.col("t")))
        )
    )
    return filled.select(
        "k",
        "t",
        *[F.col(f"l_{c}") for c in left_vals],
        *[
            F.when(choose_b, F.col(f"bv.{c}"))
            .otherwise(F.col(f"fv.{c}"))
            .alias(f"r_{c}")
            for c in right_vals
        ],
        F.when(choose_b, F.lit("backward"))
        .when(F.col("fv").isNotNull(), F.lit("forward"))
        .alias("asof_dir"),
    )
