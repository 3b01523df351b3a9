"""Dump `.explain("formatted")` for named queries to
plans/$KWACK_PLAN_ROUND/<q>_<tag>.txt (round dir defaults to r13).

Usage: python tools/explain_dump.py <tag> <query> [<query> ...]
       python tools/explain_dump.py <tag> --file <list.txt>

The tag is typically "before" or "after".  Streaming queries (which build a
StreamingQuery, not a plannable DataFrame, until executed) are skipped with a
note, since .explain on their sink table only shows the memory scan.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = (
    Path(os.environ.get("KWACK_PLAN_REPO", str(Path(__file__).resolve().parent.parent)))
    / "plans"
    / os.environ.get("KWACK_PLAN_ROUND", "r13")
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names and names[0] == "--file":
        names = Path(names[1]).read_text().split()
    OUT.mkdir(parents=True, exist_ok=True)

    from kwack_spark.plans.registry import query_map
    from kwack_spark.session import get_session

    spark = get_session(app_name="kwack-explain")
    qmap = query_map()
    sf_dir = "/root/testdata/sf0.1"
    for name in names:
        fn = qmap[name]
        path = OUT / f"{name}_{tag}.txt"
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # streaming queries execute eagerly; note it
            path.write_text(f"(not plannable statically: {e})\n")
            print(f"SKIP {name}: {e}")
            continue
        path.write_text(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
