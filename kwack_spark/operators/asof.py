"""As-of join (time-nearest, backward) — DuckDB has ASOF JOIN natively
(SURVEY.md §2.B flags it as the one relational gap); Spark does not.

Implementation is the union-merge pattern, NOT a range cross-join:

    union(left tagged 1, right tagged 0)
      -> window partitionBy(key) orderBy(ts, side)   [one shuffle on key]
      -> last(right_value, ignoreNulls) over rows unboundedPreceding..current
      -> keep left rows

Cost is a single shuffle + sort per key group — linear in |L|+|R| per key,
versus the quadratic blow-up of `L.join(R, R.ts <= L.ts)` + argmax.  This is
the plan that survives 100× scale-up: skewed keys are split by AQE, and no
row ever fans out.

Tie semantics: right rows sort before left at equal ts => backward-inclusive
(matches DuckDB ASOF JOIN's l.ts >= r.ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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
    right_ts <= left_ts).  right must be unique per (key, right_ts)."""
    r = right.select(
        F.col(key).alias("k"),
        F.col(right_ts).alias("t"),
        F.lit(0).alias("side"),
        *[F.col(c).alias(f"r_{c}") for c in right_vals],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"l_{c}") for c in left_vals],
    )
    l = left.select(
        F.col(key).alias("k"),
        F.col(left_ts).alias("t"),
        F.lit(1).alias("side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"r_{c}") for c in right_vals],
        *[F.col(c).alias(f"l_{c}") for c in left_vals],
    )
    merged = r.unionByName(l)
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
        *[
            F.last(f"r_{c}", ignorenulls=True).over(w).alias(f"r_{c}")
            for c in right_vals
        ],
    )
    return filled.filter(F.col("side") == 1).drop("side")


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
    r = right.select(
        F.col(key).alias("k"),
        F.col(right_ts).alias("t"),
        F.lit(0).alias("side"),
        *[F.col(c).alias(f"r_{c}") for c in right_vals],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"l_{c}") for c in left_vals],
    )
    l = left.select(
        F.col(key).alias("k"),
        F.col(left_ts).alias("t"),
        F.lit(1).alias("side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"r_{c}") for c in right_vals],
        *[F.col(c).alias(f"l_{c}") for c in left_vals],
    )
    merged = r.unionByName(l)
    # right rows sort after left at equal ts via descending side, and the
    # frame looks forward: first following non-null right value
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
        *[
            F.first(f"r_{c}", ignorenulls=True).over(w).alias(f"r_{c}")
            for c in right_vals
        ],
    )
    return filled.filter(F.col("side") == 1).drop("side")


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
    timestamp, used for the distance compare.  Timestamps compare in
    integer microseconds — exact."""
    r = right.select(
        F.col(key).alias("k"),
        F.col(right_ts).alias("t"),
        F.lit(0).alias("side"),
        *[F.col(c).alias(f"r_{c}") for c in right_vals],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"l_{c}") for c in left_vals],
    )
    l = left.select(
        F.col(key).alias("k"),
        F.col(left_ts).alias("t"),
        F.lit(1).alias("side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"r_{c}") for c in right_vals],
        *[F.col(c).alias(f"l_{c}") for c in left_vals],
    )
    merged = r.unionByName(l)
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
        *[
            F.last(f"r_{c}", ignorenulls=True).over(w_b).alias(f"b_{c}")
            for c in right_vals
        ],
        *[
            F.first(f"r_{c}", ignorenulls=True).over(w_f).alias(f"f_{c}")
            for c in right_vals
        ],
    ).filter(F.col("side") == 1)
    bt, ft = F.col(f"b_{right_ts_val}"), F.col(f"f_{right_ts_val}")
    choose_b = bt.isNotNull() & (
        ft.isNull()
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
            F.when(choose_b, F.col(f"b_{c}")).otherwise(F.col(f"f_{c}")).alias(f"r_{c}")
            for c in right_vals
        ],
        F.when(choose_b, F.lit("backward"))
        .when(ft.isNotNull(), F.lit("forward"))
        .alias("asof_dir"),
    )
