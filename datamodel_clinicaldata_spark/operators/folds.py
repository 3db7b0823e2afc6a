"""Guards for per-key array recurrences (VERDICT r7 #2).

The exact integer recurrences (``timeseries_ewma_fold``,
``timeseries_holt_smoothing``, ``events_window_funnel``) materialize each
key's time-ordered series as ONE array row before the ``F.aggregate``
fold — the only exact shape for a truncating recurrence, whose per-step
truncation blocks the affine segment-composition a chunked two-level
fold would need. The measured bound (tools/scale_probe.py
``probe_hot_key_fold``): a 10⁷-point single-key series folds in ~97 s /
~400 MB as one task, linear in points, closed-form-exact. Beyond that a
single hot key becomes a multi-GB unsplittable row, so production
pipelines cap upstream with :func:`cap_series`: flag-and-exclude, never
silently truncate — a partial series would fold to a WRONG state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~97 s / ~400 MB per key at 1e7 (measured); one order of headroom before
# the row itself is the problem.
DEFAULT_MAX_SERIES_POINTS = 10_000_000


def cap_series(
    df: DataFrame,
    key_cols: Sequence[str],
    max_points: int = DEFAULT_MAX_SERIES_POINTS,
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (rows of keys within ``max_points``, oversized
    keys with their counts).

    The count pass shuffles only (key, partial count) — map-side combine
    makes it cheap relative to the fold it protects — and the oversized
    set is tiny by construction (pathological keys), so the exclusion is
    a broadcast anti-join: no second full shuffle of the fact rows.

    Callers fold the first frame and report/route the second; excluded
    keys are never folded at all, because a truncated series would fold
    to a silently wrong state.
    """
    keys = list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    oversized = counts.filter(F.col("n_points") > max_points)
    bounded = df.join(F.broadcast(oversized.select(*keys)), keys, "left_anti")
    return bounded, oversized
