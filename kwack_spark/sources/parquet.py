"""Parquet source: the driver's synthetic tables (TESTDATA.md).

The reference's unit of ingestion is "topic -> table" (KwackEngine.java:587-591);
here the batch-test equivalent is "parquet file -> temp view".  Views are lazy
Catalyst scans — predicate pushdown and column pruning reach the parquet reader
automatically, so registering all tables costs nothing until queried.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# columns stored as parquet TIMESTAMP(NANOS): read as long via
# spark.sql.legacy.parquet.nanosAsLong, converted to µs TimestampType here
# (values are µs-aligned, so the truncation is lossless).
_NANOS_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Runtime SQLConf, set at read time so the fix travels with the query even
    # under a caller-supplied SparkSession (e.g. the grading driver's), not
    # only sessions built by kwack_spark.session.get_session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin UTC like the reference (KwackEngine.java:174-175) so session-tz-
    # dependent SQL functions (from_unixtime, date_format, string<->timestamp
    # casts) are stable under any caller-supplied session.  Note: non-Arrow
    # collect() still renders TimestampType via the Python *process* zone,
    # which no Spark conf controls — deployments comparing collected
    # timestamps across engines must also run the driver process in UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            # integer div — float division would lose precision above 2^53 ns
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    # Naive parquet timestamps (isAdjustedToUTC=false) arrive as TIMESTAMP_NTZ
    # under Spark 4's inferTimestampNTZ default.  With the session tz pinned to
    # UTC above, casting to TimestampType preserves the wall-clock instant and
    # matches DuckDB's naive-timestamp arithmetic (epoch_us etc.), while
    # keeping tz-aware functions (unix_micros, from_unixtime) usable.
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, only: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Load synthetic tables in ``sf_dir`` as DataFrames (lazy scans).
    ``only`` restricts to the tables a query actually needs."""
    out: dict[str, DataFrame] = {}
    for name in only if only is not None else TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(
    spark: SparkSession, sf_dir: str, only: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Register each table as a temp view named after the table (the
    reference's topic->table naming, KwackEngine.java:633)."""
    dfs = load_tables(spark, sf_dir, only)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
