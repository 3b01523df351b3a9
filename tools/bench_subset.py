"""Time a subset of registered queries with bench.py's methodology (noop
sink, N reps, median after dropping the worst rep) without paying for the
full 194-query suite — the measure/re-measure loop for targeted
optimization work.

Usage: python tools/bench_subset.py [--reps N] [--sf DIR] q1 q2 ...
Prints one JSON line {"queries": {...}, "queries_spread": {...}}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kwack_spark.plans.registry import query_map
    from kwack_spark.session import get_session
    from kwack_spark.sources.parquet import load_table

    spark = get_session(app_name="kwack-bench-subset")
    qmap = query_map()

    # same warmup as bench.py: JIT/codegen/footers + the Python worker pool
    warm = load_table(spark, args.sf, "lineitem").limit(10000)
    warm.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("s")
    ).write.mode("overwrite").format("noop").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    samples: dict[str, list[float]] = {n: [] for n in args.names}
    for rep in range(args.reps):
        for name in args.names:
            spark.sparkContext.setJobDescription(f"bench_subset:{name}")
            t = time.perf_counter()
            df = qmap[name](spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            samples[name].append(time.perf_counter() - t)
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            if jmap.size() > 0:
                spark.catalog.clearCache()
                for jrdd in list(jmap.values()):
                    try:
                        jrdd.unpersist(False)
                    except Exception:
                        pass

    def _kept(ts: list[float]) -> list[float]:
        return sorted(ts)[:-1] if len(ts) >= 3 else sorted(ts)

    out = {
        "queries": {
            n: round(_kept(ts)[len(_kept(ts)) // 2], 3)
            for n, ts in samples.items()
        },
        "queries_spread": {
            n: round(max(_kept(ts)) - min(_kept(ts)), 3)
            for n, ts in samples.items()
        },
        "reps": args.reps,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
