"""Deterministic sampling for training-data pipelines.

At 100 TB you cannot use ``df.sample()`` for dataset curation: its output
changes across retries/stage re-executions (sampling is seeded per-partition,
and partition layout is not stable), so a failed executor can silently change
the training set.  The scale-correct primitive is a *hash threshold*: a row is
kept iff ``md5(seed || key)`` falls below a cutoff.  Properties:

- reproducible: same key + seed => same decision, on any cluster layout,
  forever (and in any engine that has md5 — so it is oracle-checkable);
- narrow: a filter above the scan, no shuffle, pushes column pruning down;
- composable: disjoint seeds give independent samples (train/val/test splits
  from one pass); the same seed with a larger cutoff gives a *superset*
  (grow a sample without resampling everything).

Comparisons are on the md5 hex prefix: fixed-length lowercase hex compares
lexicographically == numerically, identically in Spark and DuckDB, so the
cutoff for fraction p is the first 4 hex digits of round(p * 16^4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_cutoff(fraction: float) -> str:
    """4-hex-digit cutoff such that P[md5_prefix < cutoff] == fraction
    (granularity 1/65536)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    n = round(fraction * 0x10000)
    if n >= 0x10000:
        # '10000' would compare lexicographically BELOW '1abc' and keep only
        # ~1/16 of rows; 'g' sorts after every hex digit, keeping all.
        return "g"
    return format(n, "04x")


def _bucket(key: Column, seed: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 4)


def sample_hash(
    df: DataFrame, key_col: str, fraction: float, seed: str = "smp"
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose keyed md5 prefix
    falls under the fraction cutoff."""
    return df.filter(_bucket(F.col(key_col), seed) < hash_cutoff(fraction))


def split_hash(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test (or any n-way) split: the keyed md5
    prefix is binned by cumulative weight cutoffs, so every row lands in
    exactly one split, the assignment is stable across runs/engines, and
    the weights sum to the full dataset (last bin is the open remainder).
    Narrow — one projected column, no shuffle."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    labels = list(weights)
    bucket = _bucket(F.col(key_col), seed)
    expr = F.lit(labels[-1])  # remainder bin: no cutoff comparison needed
    cum = 0.0
    rev: list[tuple[str, str]] = []
    for label in labels[:-1]:
        cum += weights[label]
        rev.append((label, hash_cutoff(cum)))
    for label, cutoff in reversed(rev):
        expr = F.when(bucket < cutoff, F.lit(label)).otherwise(expr)
    return df.withColumn(split_col, expr)


def stratified_sample_hash(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downweight a crawl source,
    upweight books): each stratum gets its own cutoff; unlisted strata get
    ``default_fraction``.  Still a narrow filter — the per-stratum cutoff is
    a CASE expression, no join, no shuffle; at 100 TB the stratum mix is
    rebalanced in a single pass over the data."""
    cutoff = F.lit(hash_cutoff(default_fraction))
    for value, frac in sorted(fractions.items()):
        cutoff = F.when(
            F.col(strata_col) == value, F.lit(hash_cutoff(frac))
        ).otherwise(cutoff)
    return df.filter(_bucket(F.col(key_col), seed) < cutoff)
