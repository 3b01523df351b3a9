"""kwack_spark — a PySpark-native analytics engine with the capabilities of
rayokota/kwack (in-memory SQL analytics over ingested event data), re-imagined
Spark-first.

The reference (see /root/reference, SURVEY.md) ingests Kafka topics into DuckDB
and delegates all SQL to it.  Here the equivalent architecture is:

    sources (Kafka / parquet / JSON)  ->  typed DataFrames (Catalyst plans)
        ->  temp views  ->  spark.sql() / DataFrame API  ->  sinks

Everything query-side is declarative DataFrame/SQL so Catalyst+Tungsten pick
physical strategy (broadcast vs shuffle joins, partial aggregation, whole-stage
codegen, AQE).  Python touches data only in clearly-marked Pandas-UDF paths.
"""

from kwack_spark.config import KwackConfig
from kwack_spark.engine import KwackSpark
from kwack_spark.session import get_session

__version__ = "0.4.0"

__all__ = ["get_session", "KwackSpark", "KwackConfig", "__version__"]
