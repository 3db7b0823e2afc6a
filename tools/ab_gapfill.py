"""Alternating A/B for time_bucket_gapfill variants (one session).

    python tools/ab_gapfill.py <sf_dir> <rounds>

Variants:
  A = old shape (inline window anchors: 11 running aggregates)
  B = current operator (named anchors: 4 running aggregates)
  C = B + lazy lineage pin of the bucket aggregate `b` (one events scan
      instead of two)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def _old(events):
    b = events.groupBy(
        F.col("user_id").alias("key"),
        F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
    ).agg(
        F.round(F.sum("value"), 4).alias("v"),
        F.count("*").cast("long").alias("n_events"),
    )
    spine = (
        b.groupBy("key")
        .agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
        .select(
            "key",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
                "bucket_ts"
            ),
        )
    )
    j = spine.join(b, ["key", "bucket_ts"], "left")
    w_prev = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("key")
        .orderBy(F.col("bucket_ts").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    anchor_ts = F.when(F.col("v").isNotNull(), F.col("bucket_ts"))
    prev_v = F.last("v", ignorenulls=True).over(w_prev)
    prev_t = F.last(anchor_ts, ignorenulls=True).over(w_prev)
    next_v = F.last("v", ignorenulls=True).over(w_next)
    next_t = F.last(anchor_ts, ignorenulls=True).over(w_next)
    frac = (F.unix_timestamp("bucket_ts") - F.unix_timestamp(prev_t)) / (
        F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(prev_v.isNotNull() & next_v.isNotNull(), prev_v + (next_v - prev_v) * frac)
        .when(prev_v.isNotNull(), prev_v)
        .otherwise(next_v)
    )
    return j.select(
        F.col("key").alias("user_id"),
        "bucket_ts",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.floor(filled * 10000).cast("long").alias("value_fill_e4"),
    )


def main() -> None:
    sf_dir, rounds = sys.argv[1], int(sys.argv[2])
    from datamodel_clinicaldata_spark.operators import timeseries
    from datamodel_clinicaldata_spark.session import get_spark
    from datamodel_clinicaldata_spark.sources.readers import read_table

    spark = get_spark("ab_gapfill")
    ev = read_table(spark, sf_dir, "events")

    def _new(events):
        return timeseries.time_bucket_gapfill(events)

    def _new_pin(events):
        import datamodel_clinicaldata_spark.operators.graph as graph

        b = events.groupBy(
            F.col("user_id").alias("key"),
            F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
        ).agg(
            F.round(F.sum("value"), 4).alias("v"),
            F.count("*").cast("long").alias("n_events"),
        )
        b = graph.truncate_lineage(b, None, eager=False)
        spine = (
            b.groupBy("key")
            .agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
            .select(
                "key",
                F.explode(
                    F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
                ).alias("bucket_ts"),
            )
        )
        j = spine.join(b, ["key", "bucket_ts"], "left")
        w_prev = (
            Window.partitionBy("key")
            .orderBy("bucket_ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_next = (
            Window.partitionBy("key")
            .orderBy(F.col("bucket_ts").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        anchor_ts = F.when(F.col("v").isNotNull(), F.col("bucket_ts"))
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
        frac = (F.unix_timestamp("bucket_ts") - F.unix_timestamp(prev_t)) / (
            F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
        )
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
            F.col("key").alias("user_id"),
            "bucket_ts",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.floor(filled * 10000).cast("long").alias("value_fill_e4"),
        )

    variants = {"A_old": _old, "B_new": _new, "C_pin": _new_pin}
    for name, fn in variants.items():
        fn(ev).write.mode("overwrite").format("noop").save()  # warm
    times = {k: [] for k in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"{name}:{r}")
            t0 = time.monotonic()
            fn(ev).write.mode("overwrite").format("noop").save()
            times[name].append(time.monotonic() - t0)
    for name, ts in times.items():
        print(
            f"ABGF {name} min={min(ts):.3f} runs={[round(t, 3) for t in ts]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
