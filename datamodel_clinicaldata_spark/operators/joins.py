"""Extended join shapes beyond the reference's two left equi-joins.

The reference only has left equi-joins (SURVEY.md §2.2); a usable analytics
engine needs semi/anti/range/as-of. All are expressed as compositions of
DataFrame ops so Catalyst keeps control of the physical strategy.

Scale notes:
- ``asof_join``/``range_join`` carry an equality key, so they execute as a
  hash/sort-merge equi-join with the temporal predicate as a post-join
  filter — NOT a broadcast-nested-loop. At 100 TB the equality key is what
  keeps this tractable; a keyless as-of would need range partitioning.
- The as-of dedup uses ``row_number() = 1`` per left row, which AQE runs as
  a window over the join's existing partitioning — one shuffle total when
  the join key is reused.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def semi_join(left: DataFrame, right: DataFrame, on: Column) -> DataFrame:
    """EXISTS: left rows with ≥1 match; left columns only, no fan-out."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Column) -> DataFrame:
    """NOT EXISTS: left rows with no match."""
    return left.join(right, on, "left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: Column,
    lower: Column,
    upper: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-key range join: equality on ``equi`` plus ``lower``/``upper``
    band predicates. Keeping the equality conjunct first lets Catalyst plan
    a hash join with the band as a filter."""
    return left.join(right, equi & lower & upper, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    left_id: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the single most recent right row with
    ``right_ts <= left_ts`` (backward; forward = earliest ``>=``).

    Implementation: equi-join on the key, temporal filter, then keep the
    closest match per left row via ``row_number``. ``left_id`` must uniquely
    identify left rows. Ties on ``right_ts`` break deterministically on the
    first of ``right_cols`` (descending) so results are stable.
    """
    if direction == "backward":
        cond = F.col(right_ts) <= F.col(left_ts)
        order = [F.col(right_ts).desc()]
    elif direction == "forward":
        cond = F.col(right_ts) >= F.col(left_ts)
        order = [F.col(right_ts).asc()]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    order += [F.col(c).desc() for c in right_cols[:1]]

    joined = left.join(
        right, (F.col(left_key) == F.col(right_key)) & cond, "inner"
    )
    w = Window.partitionBy(left_id).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", right_key)
    )
