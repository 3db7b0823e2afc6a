"""Physical-plan auditing — mechanized `.explain()` review.

The scale contract of this engine is not "the query returns rows", it is
"the plan is the one you would want on a 1000-executor cluster": filters
reach the parquet scan, small dimensions broadcast, windows never run
unpartitioned, exchanges are counted and justified. This module turns
those review points into assertions so they are pinned by tests
(``tests/test_plans.py``) instead of living in someone's memory of an
`.explain()` reading.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The pre-execution physical plan text (AQE isFinalPlan=false form —
    stable to assert against, no runtime re-plan noise)."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanAudit:
    """Operator counts + scan details extracted from one physical plan."""

    exchanges: int
    broadcast_exchanges: int
    sorts: int
    windows: int
    broadcast_hash_joins: int
    sort_merge_joins: int
    unpartitioned_windows: int
    scans: list[dict]

    def scan_for(self, path_fragment: str) -> dict:
        for s in self.scans:
            if path_fragment in s["location"]:
                return s
        raise AssertionError(
            f"no scan matching {path_fragment!r}; scans: "
            f"{[s['location'] for s in self.scans]}"
        )


def _window_specs(plan: str) -> list[str]:
    """Argument lists of every windowspecdefinition (one nesting level —
    enough for the specifiedwindowframe(...) trailing arg)."""
    return re.findall(r"windowspecdefinition\(((?:[^()]|\([^()]*\))*)\)", plan)


def _is_unpartitioned(spec: str) -> bool:
    """A window spec lists partition columns first, then 'col ASC/DESC ...'
    ordering entries; if the FIRST argument is already an ordering entry,
    the window has no partitioning → all rows go through one task."""
    first = spec.split(",")[0]
    return " ASC" in first or " DESC" in first


def audit(df: DataFrame) -> PlanAudit:
    plan = physical_plan(df)
    unpartitioned = sum(1 for s in _window_specs(plan) if _is_unpartitioned(s))
    # executedPlan().toString() renders each FileScan on one line:
    # "FileScan parquet [cols] Batched: true, ..., Location: InMemoryFileIndex
    #  (1 paths)[file:/...], ..., PushedFilters: [...], ReadSchema: struct<...>"
    scans = []
    for line in plan.splitlines():
        if "FileScan" not in line and "Scan parquet" not in line:
            continue
        loc = re.search(r"Location: [^\[,]*\[([^\]]*)\]", line)
        pf = re.search(r"PushedFilters: \[([^\]]*)\]", line)
        rs = re.search(r"ReadSchema: (\S+)", line)
        scans.append(
            {
                "location": loc.group(1) if loc else "",
                "pushed_filters": [
                    f.strip() for f in (pf.group(1) if pf else "").split(",") if f.strip()
                ],
                "read_schema": rs.group(1) if rs else "",
            }
        )
    return PlanAudit(
        exchanges=len(re.findall(r"Exchange hashpartitioning", plan)),
        broadcast_exchanges=len(re.findall(r"BroadcastExchange", plan)),
        sorts=len(re.findall(r"\bSort \[", plan)),
        windows=len(re.findall(r"\bWindow \[", plan)),
        broadcast_hash_joins=len(re.findall(r"BroadcastHashJoin", plan)),
        sort_merge_joins=len(re.findall(r"SortMergeJoin", plan)),
        unpartitioned_windows=unpartitioned,
        scans=scans,
    )


def assert_no_unpartitioned_window(df: DataFrame) -> None:
    """Fail if any window in the plan moves all rows to one partition
    (the WindowExec 'No Partition Defined' degradation)."""
    for spec in _window_specs(physical_plan(df)):
        if _is_unpartitioned(spec):
            raise AssertionError(f"unpartitioned window found: {spec[:120]}")
