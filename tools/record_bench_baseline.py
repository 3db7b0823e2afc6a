"""Promote the latest bench_out.json medians to bench_baseline.json so the
next round's bench.py emits per-query `vs_prev` deltas against THIS round
(verdict r5 #6). Run at round close after the final bench.

Stale-proofing (verdict r9 #9): promotion is REFUSED when the candidate
run's own host evidence says its measurement window was loaded
(mid-headline loadavg above the threshold) — a baseline captured under
load poisons every following round's vs_prev comparison, which is exactly
how r9's phantom +10% happened. Pass --force to override. The promoted
record carries its provenance (source file, host snapshot) so rounds
compare like-for-like.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# The bench's own 32-thread bursts read ~8-12 on load1 (see the
# calibration note in bench.py's host block); external contamination
# reads 20+. The refusal threshold sits between the two regimes.
MAX_MID_LOAD = 14.0


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv[1:]
    out_path = os.path.join(ROOT, "bench_out.json")
    if not os.path.isfile(out_path):
        print("no bench_out.json — run bench.py first")
        return 1
    with open(out_path) as fh:
        out = json.load(fh)
    host = out.get("host", {})
    mid = host.get("loadavg_mid_headline_max")
    start = (host.get("loadavg_at_start") or [0.0])[0]
    # r10: the canary gate sees hypervisor noise loadavg cannot; a run
    # where many windows stayed noisy even after their one redo is not
    # baseline material.
    noisy = set(host.get("canary", {}).get("noisy_queries", []))
    if (
        (mid is not None and mid > MAX_MID_LOAD)
        or start > 4.0
        or len(noisy) > 8
    ) and not force:
        print(
            f"REFUSED: mid-headline loadavg {mid} (max {MAX_MID_LOAD}) / "
            f"start loadavg {start} (max 4.0) / {len(noisy)} canary-flagged "
            "windows (max 8) — this run was measured under load and would "
            "poison vs_prev for every following round. Re-run bench.py on "
            "a quiet box, or pass --force."
        )
        return 2
    rnd = int(args[0]) if args else None
    with open(os.path.join(ROOT, "bench_baseline.json"), "w") as fh:
        json.dump(
            {
                "round": rnd,
                "queries_median": out.get("queries_median", {}),
                "provenance": {
                    "source": "bench_out.json",
                    "headline_total": out.get("value"),
                    "host": host,
                },
            },
            fh,
            indent=1,
        )
    print(
        f"baseline updated: {len(out.get('queries_median', {}))} medians "
        f"(mid-headline load {mid})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
