"""Re-pin BENCH_BASELINE.json from two (or more) fresh bench runs.

Protocol (BENCH_BASELINE.json's own note): per-query pinned median =
elementwise MIN of the runs' medians — ambient load on this box only ever
inflates timings, so the min across independent sessions is the least-noisy
steady-state estimate and keeps the regression gate strict.  Spread is
pinned as the elementwise MAX of the runs' spreads (the widest observed
run-to-run jitter, so tools/bench_regress.py doesn't false-positive on a
query that legitimately wobbles).

Usage:
    python tools/pin_baseline.py RUN1.json RUN2.json [...] --note "..."
Writes BENCH_BASELINE.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--note", required=True)
    ap.add_argument("--out", default=str(ROOT / "BENCH_BASELINE.json"))
    args = ap.parse_args()

    runs = [json.loads(Path(p).read_text()) for p in args.runs]
    names = set()
    for r in runs:
        names |= set(r["queries"])

    queries, spread = {}, {}
    for n in sorted(names):
        meds = [r["queries"][n] for r in runs if n in r["queries"]]
        sps = [r.get("queries_spread", {}).get(n, 0.0) for r in runs if n in r["queries"]]
        queries[n] = min(meds)
        spread[n] = max(sps)

    base = dict(runs[0])  # env/reps/sf metadata from the first run
    base["queries"] = queries
    base["queries_spread"] = spread
    base["n_queries"] = len(queries)
    base["init_sec"] = min(r["init_sec"] for r in runs)
    base["warmup_sec"] = min(r["warmup_sec"] for r in runs)
    base["value"] = round(
        base["init_sec"] + base["warmup_sec"] + sum(queries.values()), 3
    )
    base["total_wall_sec"] = round(sum(r["total_wall_sec"] for r in runs), 3)
    base["note"] = args.note
    Path(args.out).write_text(json.dumps(base, indent=1, sort_keys=True) + "\n")
    print(f"pinned {len(queries)} queries -> {args.out}; value={base['value']}")


if __name__ == "__main__":
    main()
