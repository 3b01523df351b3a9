"""Per-query bench regression gate: diff a fresh BENCH_LOCAL.json (written
by bench.py on every run) against the committed BENCH_BASELINE.json.

A query REGRESSES when its median grew more than RATIO (default 1.25x) AND
more than max(FLOOR, its recorded max-min spread) seconds (FLOOR default
0.3 s — sub-second queries jitter by scheduler noise, and a query whose
reps already spread 1 s run-to-run can legitimately move 1 s between
sessions; the committed spread is measured, not guessed).  New queries
(absent from the baseline) are listed, never failed on.

Usage:  python tools/bench_regress.py [--baseline F] [--current F]
Exit 1 iff any overlapping query regressed.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

RATIO = 1.25
FLOOR = 0.3

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", default=str(ROOT / "BENCH_BASELINE.json"))
    ap.add_argument("--current", default=str(ROOT / "BENCH_LOCAL.json"))
    ap.add_argument("--ratio", type=float, default=RATIO)
    ap.add_argument("--floor", type=float, default=FLOOR)
    args = ap.parse_args()

    base = json.loads(Path(args.baseline).read_text())
    cur = json.loads(Path(args.current).read_text())
    bq, cq = base["queries"], cur["queries"]
    bspread = base.get("queries_spread", {})

    regressed, improved, new = [], [], []
    for name, t in sorted(cq.items()):
        if name not in bq:
            new.append((name, t))
            continue
        b = bq[name]
        slack = max(args.floor, bspread.get(name, 0.0))
        if t > b * args.ratio and t - b > slack:
            regressed.append((name, b, t))
        elif b > t * args.ratio and b - t > slack:
            improved.append((name, b, t))

    for name, b, t in regressed:
        print(f"REGRESSED {name}: {b:.3f}s -> {t:.3f}s ({t / b:.2f}x)")
    for name, b, t in improved:
        print(f"improved  {name}: {b:.3f}s -> {t:.3f}s ({t / b:.2f}x)")
    for name, t in new:
        print(f"new       {name}: {t:.3f}s (no baseline)")
    print(
        f"total one-cycle: baseline {base['value']:.1f}s"
        f" ({base['n_queries']} queries) -> current {cur['value']:.1f}s"
        f" ({cur['n_queries']} queries);"
        f" {len(regressed)} regressed / {len(improved)} improved /"
        f" {len(new)} new"
    )
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
