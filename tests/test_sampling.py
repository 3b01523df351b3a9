"""Deterministic-sampling properties (operators/sampling.py).

The differential oracle suite covers Spark==DuckDB for the registered
sampling queries; these tests pin the operator-level guarantees: cutoff
arithmetic, determinism, superset growth, and stratum isolation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kwack_spark.operators.sampling import (
    hash_cutoff,
    sample_hash,
    split_hash,
    stratified_sample_hash,
)
from kwack_spark.sources.parquet import load_table
from tests.conftest import SF_SMALL


def test_hash_cutoff_bounds():
    assert hash_cutoff(0.0) == "0000"
    assert hash_cutoff(1.0) == "g"  # sorts after every hex digit: keeps all
    assert hash_cutoff(0.5) == "8000"
    with pytest.raises(ValueError):
        hash_cutoff(1.5)
    with pytest.raises(ValueError):
        hash_cutoff(-0.1)


def test_sample_deterministic_and_superset(spark):
    d = load_table(spark, SF_SMALL, "documents").select("doc_id")
    s10a = {r[0] for r in sample_hash(d, "doc_id", 0.10).collect()}
    s10b = {r[0] for r in sample_hash(d, "doc_id", 0.10).collect()}
    s25 = {r[0] for r in sample_hash(d, "doc_id", 0.25).collect()}
    assert s10a == s10b  # same seed+key => same sample, every run
    assert s10a <= s25  # larger fraction, same seed => superset
    n = d.count()
    assert 0 < len(s10a) < len(s25) < n


def test_independent_seeds_differ(spark):
    d = load_table(spark, SF_SMALL, "documents").select("doc_id")
    a = {r[0] for r in sample_hash(d, "doc_id", 0.3, seed="s1").collect()}
    b = {r[0] for r in sample_hash(d, "doc_id", 0.3, seed="s2").collect()}
    assert a != b  # disjoint seeds => independent draws


def test_split_hash_partitions_everything(spark):
    d = load_table(spark, SF_SMALL, "documents").select("doc_id")
    out = split_hash(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == d.count()  # every row in exactly one split
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]  # 80% dominates 10%
    with pytest.raises(ValueError):
        split_hash(d, "doc_id", {"a": 0.5, "b": 0.3})  # doesn't sum to 1


def test_stratified_fractions_apply_per_stratum(spark):
    d = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang")
    out = stratified_sample_hash(
        d, "doc_id", "lang", {"en": 0.0}, default_fraction=1.0
    )
    langs = {r["lang"] for r in out.collect()}
    assert "en" not in langs  # zero-fraction stratum fully dropped
    kept = out.count()
    non_en = d.filter("lang <> 'en'").count()
    assert kept == non_en  # default 1.0 keeps every other stratum
