"""Range (band) join: pair rows whose timestamps fall within a bounded
interval of each other, without a nested-loop plan.

The reference delegates range predicates to DuckDB's IEJoin-style executor
(kwack has no join operators of its own, SURVEY.md §0); Spark's native plan
for an equi+range condition is a SortMergeJoin with the band as a post-join
filter — fine while the equi keys spread the data, degenerate when keys are
hot or absent (BroadcastNestedLoopJoin).  ``band_join`` restores a pure
equi-join shape at any key distribution: bucket both sides by
``bucket = floor(ts / width)`` with width >= the band span, so every
matching pair shares one of at most two adjacent buckets; the small
constant fan-out (<= 2 candidate buckets per left row) replaces an O(n*m)
candidate space with O(matches + near-misses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    how: str = "inner",
) -> DataFrame:
    """Join rows with equal ``keys`` where
    ``lower <= left[left_ts] - right[right_ts] <= upper`` (same integer time
    unit on both sides, e.g. epoch micros).

    Matching right values lie in [left_ts - upper, left_ts - lower], a span
    of ``upper - lower``; with bucket width >= that span the interval covers
    at most two buckets, so the left side explodes to <= 2 bucket probes and
    the join runs as a plain equi join on (keys..., bucket) with the exact
    band applied as a filter.  Column names must be disjoint apart from
    ``keys`` (pre-select/alias the inputs).
    """
    if how != "inner":
        raise ValueError(
            "band_join supports how='inner' only: the bucket explode emits up "
            "to 2 probe rows per left row, so an outer side would duplicate "
            "unmatched rows (and the band filter would drop their nulls)"
        )
    width = max(upper - lower, 1)

    def floor_div(c):
        # exact floor division in integer arithmetic: `/` on longs is IEEE
        # double division, and for epoch-micros-sized operands a correctly
        # rounded quotient can land one ulp past an integer boundary and
        # misplace the bucket.  (c - pmod(c, w)) is an exact multiple of w
        # (pmod is non-negative, so this is a true floor for either sign),
        # and the remaining division is exact while |c| < 2^53 — epoch
        # micros stay under that until year ~2255.
        return ((c - F.pmod(c, F.lit(width))) / F.lit(width)).cast("long")

    r = right.withColumn("__band_b", floor_div(F.col(right_ts)))
    l = left.withColumn(
        "__band_b",
        F.explode(
            F.array_distinct(
                F.array(
                    floor_div(F.col(left_ts) - F.lit(upper)),
                    floor_div(F.col(left_ts) - F.lit(lower)),
                )
            )
        ),
    )
    delta = F.col(left_ts) - F.col(right_ts)
    out = l.join(r, [*keys, "__band_b"], how).where(
        (delta >= F.lit(lower)) & (delta <= F.lit(upper))
    )
    return out.drop("__band_b")
