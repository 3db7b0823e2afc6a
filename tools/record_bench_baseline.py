"""Promote per-cell MINIMA across ≥2 canary-gated bench runs to
bench_baseline.json so the next round's bench.py emits per-query
`vs_prev` deltas against THIS round. Run at round close after ≥2 clean
benches.

Why min-of-N, not one run's medians (verdict r10 #1): the host is a
hypervisor guest whose CPU is stolen in multi-second bursts no
guest-visible counter records. bench.py's canary-sandwich discards runs
whose *bracket* saw a burst, but a burst shorter than the bracket
spacing lands inside the timed window undetected — which is how the r10
promoted baseline carried cells its own sibling record refuted by up to
4.5× (agg_market_share 5.47 s vs 1.21 s). Steal noise is strictly
ADDITIVE: a cell can read too slow, never too fast, so the per-cell
minimum across independent gated runs is a consistent estimator of the
true cost while any single run's median is contaminated by whatever
bursts it happened to absorb. ≥2 runs are REQUIRED (--force drops to 1,
leaving a provenance mark); cells whose max/min spread across the
contributing runs exceeds 1.5× are listed in provenance as
`high_spread_cells` — residual-contamination tripwires for the next
reader, with the min still promoted.

Per-run gate (r9/r10 stale-proofing + r12 provenance hardening): a run
is refused as a contributor when its own host evidence says the window
was loaded (mid-headline loadavg, start loadavg, canary-flagged window
count), when the canary accounting is MISSING entirely (pre-r10 format
or a future bench edit dropping it — absence of the primary
contamination instrument is itself a refusal, ADVICE r11), when the
record is unstamped (no git_sha — ADVICE r11: the no-args glob silently
folded stale cells measured on old code into new baselines), or when it
was budget-degraded (partial / truncated / cold cells — driver-budget
runs are not baseline material; promote from unbounded
SPARK_GRAFT_BENCH_BUDGET_SEC=0 runs). Cross-run: all contributors must
share one sf and one git_sha, and that sha must be the current HEAD.

Usage:
    python tools/record_bench_baseline.py <round> run1.json run2.json [...]
    python tools/record_bench_baseline.py <round>            # bench_out.json + bench_run_*.json
    --force    accept contaminated/single/mismatched runs anyway (provenance records it)
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Mid-headline loadavg is a BACKSTOP, not the primary gate (r11
# recalibration, measured): under hypervisor steal the bench's own 32
# threads queue up and load1 reads 15-21 with zero external work — run B
# of the r11 pair hit mid 20.6 while its canary stayed clean and its
# cells matched the quiet-host record (lsh_prod 2.62 s vs the 2.65 s
# quiet best), while run A passed at mid 14.9 yet carried 34×-inflated
# cells. The canary accounting (noisy windows, exhausted budget) is the
# contamination instrument; START loadavg still catches pre-existing
# external work (r9's probe-contaminated capture), and the mid backstop
# only fires on load no self-inflicted steal queue reaches.
MAX_MID_LOAD = 24.0
MAX_START_LOAD = 4.0
MAX_NOISY = 8
SPREAD_FLAG = 1.5


def _gate(path: str, run: dict) -> str | None:
    """Reason string when this run is not baseline material, else None."""
    host = run.get("host", {})
    mid = host.get("loadavg_mid_headline_max")
    start = (host.get("loadavg_at_start") or [0.0])[0]
    canary = host.get("canary")
    if canary is None:
        # The canary accounting is the PRIMARY contamination gate; a
        # record without it cannot prove its windows were quiet — treat
        # absence like an exhausted budget, not like zero noise.
        return f"{path}: no host.canary block (pre-r10 format or stripped)"
    if not run.get("git_sha"):
        return f"{path}: unstamped record (no git_sha; pre-r12 format)"
    if run.get("partial"):
        return f"{path}: partial record (headline loop never finished)"
    bdg = run.get("budget", {})
    if bdg.get("truncated_after"):
        return f"{path}: budget-truncated after {bdg['truncated_after']}"
    if bdg.get("cold_cells"):
        return (
            f"{path}: {len(bdg['cold_cells'])} cold cells (untimed runs "
            "recorded under budget pressure)"
        )
    mp = canary.get("mp")
    if not isinstance(mp, dict):
        # r12 lesson: a run recorded noisy_queries=[] while mid-run cells
        # inflated 18-55× under PARALLEL-punishing steal the 1-thread
        # canary cannot see. Without the mp instrument's evidence the
        # run's quiet-windows claim is unfalsifiable — refuse.
        return f"{path}: no parallel-canary evidence (host.canary.mp)"
    if len(mp.get("degraded_queries", [])) > MAX_NOISY:
        return (
            f"{path}: {len(mp['degraded_queries'])} parallel-canary-"
            f"degraded windows > {MAX_NOISY}"
        )
    noisy = canary.get("noisy_queries", [])
    if mid is not None and mid > MAX_MID_LOAD:
        return f"{path}: mid-headline loadavg {mid} > {MAX_MID_LOAD}"
    if start > MAX_START_LOAD:
        return f"{path}: start loadavg {start} > {MAX_START_LOAD}"
    if len(noisy) > MAX_NOISY:
        return f"{path}: {len(noisy)} canary-flagged windows > {MAX_NOISY}"
    # r13: the steal tripwire's own verdicts gate too — a run where many
    # cells stayed >3× their floor through a gated re-measure was taken
    # in sustained weather (the steal-sim record flags all 6 of 6);
    # min-of-N absorbs a couple, a storm's worth poisons the minima.
    suspect = run.get("suspect_weather", [])
    if len(suspect) > MAX_NOISY:
        return f"{path}: {len(suspect)} suspect_weather cells > {MAX_NOISY}"
    if canary.get("budget_exhausted"):
        return f"{path}: canary wait budget exhausted (ungated timings)"
    return None


def _head_sha() -> str | None:
    try:
        import subprocess

        return (
            subprocess.run(
                ["git", "-C", ROOT, "rev-parse", "--short=12", "HEAD"],
                capture_output=True,
                text=True,
                timeout=10,
            ).stdout.strip()
            or None
        )
    except Exception:  # noqa: BLE001
        return None


def main() -> int:
    force = "--force" in sys.argv[1:]
    args = [a for a in sys.argv[1:] if a != "--force"]
    rnd = int(args[0]) if args else None
    paths = args[1:]
    if not paths:
        paths = [
            p
            for p in [os.path.join(ROOT, "bench_out.json")]
            + sorted(glob.glob(os.path.join(ROOT, "bench_run_*.json")))
            if os.path.isfile(p)
        ]
    if not paths:
        print("no bench records — run bench.py first")
        return 1

    runs: list[tuple[str, dict]] = []
    refused: list[str] = []
    head = _head_sha()
    ref_sf = None
    ref_sha = None
    for p in paths:
        with open(p) as fh:
            run = json.load(fh)
        reason = _gate(p, run)
        # Cross-run consistency (ADVICE r11): per-cell minima across runs
        # are only comparable when every contributor measured the SAME
        # code at the SAME scale — and a baseline promoted from a sha
        # other than HEAD is stale the moment it lands. The HEAD check
        # runs BEFORE the reference capture (ADVICE r12): a leftover
        # stale-sha bench_out.json must be refused WITHOUT becoming the
        # reference, or it poisons ref_sha and every genuinely-fresh run
        # after it gets refused for "mismatching the first contributor".
        if reason is None and head and run.get("git_sha") != head:
            reason = f"{p}: git_sha {run.get('git_sha')} != HEAD {head}"
        if reason is None and ref_sf is not None:
            if run.get("sf") != ref_sf:
                reason = f"{p}: sf {run.get('sf')} != first contributor's {ref_sf}"
            elif run.get("git_sha") != ref_sha:
                reason = (
                    f"{p}: git_sha {run.get('git_sha')} != first "
                    f"contributor's {ref_sha}"
                )
        if reason is None and ref_sf is None:
            # Only a run that passed EVERY check becomes the reference.
            ref_sf, ref_sha = run.get("sf"), run.get("git_sha")
        if reason and not force:
            print(f"SKIP contributor — {reason}")
            refused.append(reason)
            continue
        if reason:
            print(f"FORCED contributor — {reason}")
        runs.append((os.path.basename(p), run))

    if not runs:
        print(
            "REFUSED: every candidate run was measured under load and "
            "would poison vs_prev for every following round. Re-run "
            "bench.py on a quiet box, or pass --force."
        )
        return 2
    if len(runs) < 2 and not force:
        print(
            f"REFUSED: only {len(runs)} gated run(s) — min-of-N needs ≥2 "
            "independent clean runs to reject intra-window steal bursts "
            "(verdict r10 #1). Record another bench_run_*.json, or pass "
            "--force to promote a single run (provenance will say so)."
        )
        return 3

    # per-cell min across contributing runs + spread accounting
    cells: dict[str, list[float]] = {}
    for _, run in runs:
        for q, v in run.get("queries_median", {}).items():
            cells.setdefault(q, []).append(float(v))
    minima = {q: round(min(vs), 4) for q, vs in cells.items()}
    spread = {
        q: round(max(vs) / min(vs), 2)
        for q, vs in cells.items()
        if min(vs) > 0 and len(vs) > 1
    }
    high_spread = {q: r for q, r in sorted(spread.items()) if r > SPREAD_FLAG}
    partial = {q: len(vs) for q, vs in cells.items() if len(vs) < len(runs)}

    with open(os.path.join(ROOT, "bench_baseline.json"), "w") as fh:
        json.dump(
            {
                "round": rnd,
                "policy": f"per-cell min across {len(runs)} canary-gated runs",
                # canonical key since r12: these are per-cell FLOORS
                # (min-of-N), not medians — vs_prev readers compare a
                # run's median against this floor (ADVICE r11 naming fix)
                "queries_min": minima,
                "git_sha": ref_sha,
                "sf": ref_sf,
                "provenance": {
                    "contributors": [
                        {
                            "source": name,
                            "headline_total": run.get("value"),
                            "git_sha": run.get("git_sha"),
                            "sf": run.get("sf"),
                            "host": run.get("host", {}),
                        }
                        for name, run in runs
                    ],
                    "refused": refused,
                    "forced": force,
                    "high_spread_cells": high_spread,
                    "cells_missing_from_some_runs": partial,
                },
            },
            fh,
            indent=1,
        )
    print(
        f"baseline updated: {len(minima)} cells = min over {len(runs)} "
        f"run(s); {len(high_spread)} high-spread cells"
        + (f" ({', '.join(list(high_spread)[:8])})" if high_spread else "")
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
