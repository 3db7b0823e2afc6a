"""Promote the latest bench_out.json medians to bench_baseline.json so the
next round's bench.py emits per-query `vs_prev` deltas against THIS round
(verdict r5 #6). Run at round close after the final bench."""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    out_path = os.path.join(ROOT, "bench_out.json")
    if not os.path.isfile(out_path):
        print("no bench_out.json — run bench.py first")
        return 1
    with open(out_path) as fh:
        out = json.load(fh)
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else None
    with open(os.path.join(ROOT, "bench_baseline.json"), "w") as fh:
        json.dump(
            {"round": rnd, "queries_median": out.get("queries_median", {})},
            fh,
            indent=1,
        )
    print(f"baseline updated: {len(out.get('queries_median', {}))} medians")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
