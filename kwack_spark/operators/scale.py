"""Scale patterns: bucketing, salting, two-phase aggregation.

The levers for the shuffles that remain after Catalyst has done its part:

- ``bucket_table``: persist a table bucketed+sorted on its join key.  Two
  tables bucketed the same way join with ZERO exchange (SortMergeJoin reads
  co-located buckets) — the pattern for repeated fact-fact joins over the
  same key at 100 TB, where re-shuffling 100 TB per query is the bottleneck.
- ``salted_join``: for a skewed join key (one hot key dominating a
  partition), spread the hot rows over ``salt`` sub-keys; the small side is
  replicated ``salt`` times.  AQE's skew-join split handles moderate skew
  automatically (enabled in session.py); salting is the heavy hammer for a
  single pathological key.
- ``salted_agg``: two-phase aggregation for skewed GROUP BY keys: partial
  aggregate on (key, salt) — spreading the hot key over many tasks — then
  final aggregate on key.  Only valid for decomposable aggregates
  (sum/count/min/max), which is enforced by taking (partial, final) pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def bucket_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    keys: list[str],
    num_buckets: int = 32,
) -> DataFrame:
    """Persist df bucketed+sorted by keys; returns the bucketed table.
    Joins between tables bucketed identically on the join key produce no
    Exchange (verified in tests by plan inspection)."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(name)
    )
    return spark.table(name)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the left (skewed, large) side salted and the
    right side replicated ``salt`` times.  Output equals the plain join; the
    shuffle spreads each hot key over ``salt`` partitions.

    The salt is derived from a uniformly-distributing hash of the whole left
    row (monotonically_increasing_id would break determinism under retry;
    xxhash64 of the row's columns is retry-stable).

    Only 'inner' and 'left' are supported: right/full outer would emit each
    unmatched right row once per salt replica, breaking the equality."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} — an outer "
            "right side is replicated per salt and would duplicate unmatched rows"
        )
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).alias(
        "__salt"
    )
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_finals: list[tuple[Column, "str", "str"]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_finals``: (partial_agg_column_aliased, final_fn_name, out_name)
    triples, e.g. ``(F.sum("x").alias("px"), "sum", "total_x")`` — the
    partial runs per (keys, salt), the final re-aggregates per keys.  Valid
    only for decomposable aggregates (sum/count->sum, min, max)."""
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    partial = (
        df.withColumn("__salt", salt_col)
        .groupBy(*keys, "__salt")
        .agg(*[p for p, _, _ in partial_finals])
    )
    finals = []
    for p, fn, out_name in partial_finals:
        # partial alias is the aggregation column's name in `partial`
        p_name = partial.columns[len(keys) + 1 + len(finals)]
        finals.append(getattr(F, fn)(p_name).alias(out_name))
    return partial.groupBy(*keys).agg(*finals)
