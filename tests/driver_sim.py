"""Simulate the grading driver: a *vanilla* SparkSession (none of
kwack_spark.session's confs) running every registered query against its DuckDB
oracle at sf0.01.  Catches session-dependence bugs the pytest suite (which uses
get_session) cannot — round 1 lost 4 queries exactly this way.

Usage: python tests/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare_query, duck_connect


def main(sf_dir: str = SF_ORACLE) -> int:
    spark = (
        SparkSession.builder.appName("driver-sim")
        .master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duck_connect(sf_dir)
    failed = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sql = oracles.get(name)
            if sql is None:
                df = fn(spark, sf_dir)
                from tests.oracle_harness import ungradable_columns

                bad = ungradable_columns(df.schema)
                if bad:
                    ok, detail = False, f"driver-ungradable columns {bad}"
                else:
                    ok, detail = True, f"rows-only ({df.count()} rows)"
            else:
                ok, detail = compare_query(spark, con, fn, sql, sf_dir)
        except Exception as exc:  # noqa: BLE001
            ok, detail = False, f"EXC {type(exc).__name__}: {exc}"
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name:32s} {dt:6.2f}s  {detail[:140]}")
        if not ok:
            failed.append(name)
    print(f"\n{len(qs) - len(failed)}/{len(qs)} green; failed: {failed}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
