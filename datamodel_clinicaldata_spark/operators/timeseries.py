"""Time-series regularization — hypertable-style bucket rollup with gap
filling and linear interpolation (the `time_bucket_gapfill` /
`interpolate` shape of time-series engines, re-expressed as DataFrame
ops: bucket agg → per-key spine via sequence+explode → spine⟕agg left
join → IGNORE NULLS window carry → arithmetic fill).

Scale notes:
- The spine is generated per key from that key's own [min, max] bucket
  span (sequence + explode) — never a driver-side calendar crossJoin; a
  key's spine length is bounded by its activity span, and spine rows are
  3 columns wide.
- One shuffle partitions by key; the bucket agg, both IGNORE-NULLS
  window passes, and the final projection all share it.
- Interpolation is pure column arithmetic on the carried (prev, next)
  anchors — no UDFs, whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_bucket_gapfill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Regularize an event stream to one row per (key, bucket) over each
    key's active span, with missing buckets linearly interpolated between
    their nearest populated neighbours (edges forward/backward-filled).

    Returns (key, bucket_ts, n_events, value_fill_e4):
    - ``n_events`` — rows aggregated into the bucket (0 for gap rows).
    - ``value_fill_e4`` — the filled per-bucket value sum, fixed-point
      ×10⁴ (``floor(x * 10000)``). Fixed-point-and-floor, not round: the
      interpolated quotient lands on exact decimal half-ties at dyadic
      gap fractions, where IEEE-vs-decimal rounding modes legitimately
      diverge across engines; floor of a bit-identical double is
      engine-independent. The interpolation INPUTS are the 4-dp-rounded
      bucket sums, so both engines fill from bit-identical anchors.
    """
    from datamodel_clinicaldata_spark.operators.graph import truncate_lineage

    b = (
        events.groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(
            F.round(F.sum(value_col), 4).alias("v"),
            F.count("*").cast("long").alias("n_events"),
        )
    )
    # Lazy lineage pin: `b` feeds BOTH the spine (per-key lo/hi) and the
    # join's build side; unpinned, the optimizer collapses the spine
    # branch into a second full scan+aggregate of `events` (the 100 TB
    # input), while the pin materializes the (key, bucket) rollup — a
    # frame bounded by the key×bucket domain — and reads it twice.
    # Measured no worse at sf0.1 (alternating A/B, OPTIMIZATION_r13.md).
    b = truncate_lineage(b, None, eager=False)
    spine = (
        b.groupBy("key")
        .agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
        .select(
            "key",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL 1 {bucket.upper()}"))
            ).alias("bucket_ts"),
        )
    )
    j = spine.join(b, ["key", "bucket_ts"], "left")

    w_prev = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward anchors via a DESCENDING running frame, not
    # `currentRow → unboundedFollowing`: Spark's unbounded-following frame
    # recomputes the aggregate from scratch per row (O(n²) per partition,
    # measured 9.8s → 1.5s at sf0.1 on this query's spine), while the
    # running frame is incrementally maintained O(n). `last ignorenulls`
    # over desc order ≡ `first ignorenulls` over asc unbounded-following.
    w_next = (
        Window.partitionBy("key")
        .orderBy(F.col("bucket_ts").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    anchor_ts = F.when(F.col("v").isNotNull(), F.col("bucket_ts"))
    # Anchors are NAMED COLUMNS, not inline window expressions: every
    # reference to an inline `F.last(..).over(w)` in the fill CASE
    # expands to its own window aggregate (the old plan ran last(v) asc
    # SEVEN times and 11 running aggregates total); naming them keeps
    # each Window operator at exactly its 2 aggregates. Same expressions,
    # bit-identical doubles.
    withprev = j.select(
        "key",
        "bucket_ts",
        "v",
        "n_events",
        F.last("v", ignorenulls=True).over(w_prev).alias("__prev_v"),
        F.last(anchor_ts, ignorenulls=True).over(w_prev).alias("__prev_t"),
    )
    anchored = withprev.select(
        "key",
        "bucket_ts",
        "v",
        "n_events",
        "__prev_v",
        "__prev_t",
        F.last("v", ignorenulls=True).over(w_next).alias("__next_v"),
        F.last(anchor_ts, ignorenulls=True).over(w_next).alias("__next_t"),
    )
    prev_v, prev_t = F.col("__prev_v"), F.col("__prev_t")
    next_v, next_t = F.col("__next_v"), F.col("__next_t")

    frac = (
        F.unix_timestamp("bucket_ts") - F.unix_timestamp(prev_t)
    ) / (F.unix_timestamp(next_t) - F.unix_timestamp(prev_t))
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * frac,
        )
        .when(prev_v.isNotNull(), prev_v)
        .otherwise(next_v)
    )
    return anchored.select(
        F.col("key").alias(key_col),
        "bucket_ts",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.floor(filled * 10000).cast("long").alias("value_fill_e4"),
    )
