"""cap_series guard (operators/folds.py): hot keys are flagged and
excluded whole — never silently truncated into a wrong fold state."""

from pyspark.sql import functions as F

from datamodel_clinicaldata_spark.operators.folds import cap_series


def test_cap_series_splits_hot_key(spark):
    rows = [("hot", i) for i in range(50)] + [("a", 1), ("a", 2), ("b", 7)]
    df = spark.createDataFrame(rows, "k string, v long")
    bounded, oversized = cap_series(df, ["k"], max_points=10)
    assert bounded.filter(F.col("k") == "hot").count() == 0
    assert bounded.count() == 3  # a x2 + b x1, untouched
    over = {r["k"]: r["n_points"] for r in oversized.collect()}
    assert over == {"hot": 50}


def test_cap_series_all_within_bound_is_identity(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    bounded, oversized = cap_series(df, ["k"], max_points=10)
    assert oversized.count() == 0
    assert sorted(r["k"] for r in bounded.collect()) == ["a", "b"]


def test_cap_series_fold_on_bounded_matches_unguarded(spark):
    """The guard must not perturb surviving keys' fold results."""
    rows = [("u", t, 1_000_000) for t in range(5)] + [
        ("hot", t, 2_000_000) for t in range(20)
    ]
    df = spark.createDataFrame(rows, "k string, t long, v long")

    def fold(frame):
        per = frame.groupBy("k").agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("t"), F.col("v")))
            ).alias("ps")
        )

        def step(acc, p):
            nxt = 8 * acc + 2 * p["v"]
            m = ((nxt % 10) + 10) % 10
            return F.when(acc.isNull(), p["v"]).otherwise(
                ((nxt - m).cast("decimal(38,0)") / F.lit(10)).cast("long")
            )

        return per.select(
            "k",
            F.aggregate(F.col("ps"), F.lit(None).cast("long"), step).alias(
                "ewma"
            ),
        )

    bounded, _ = cap_series(df, ["k"], max_points=10)
    guarded = {r["k"]: r["ewma"] for r in fold(bounded).collect()}
    unguarded = {r["k"]: r["ewma"] for r in fold(df).collect()}
    assert guarded == {"u": unguarded["u"]}  # constant series: exactly v
    assert guarded["u"] == 1_000_000


def _idiv10(x):
    m = ((x % 10) + 10) % 10
    return ((x - m).cast("decimal(38,0)") / F.lit(10)).cast("long")


def _ewma_step(acc, p):
    """The truncating integer EWMA — the recurrence whose per-step
    truncation makes parallel segment composition impossible."""
    return F.when(acc.isNull(), p["v"]).otherwise(_idiv10(8 * acc + 2 * p["v"]))


def test_segmented_fold_matches_monolithic(spark):
    """segmented_fold applies the IDENTICAL step sequence as the
    monolithic collect_list → array_sort → aggregate shape — exact
    equality per key, across segment boundaries, at every segment size
    (including S larger than any series = the degenerate 1-round case)."""
    from datamodel_clinicaldata_spark.operators.folds import segmented_fold

    rows = spark.range(3 * 997).select(
        (F.col("id") % 3).alias("k"),
        F.struct(
            (F.col("id") / 3).cast("long").alias("t"),
            ((F.col("id") * 2654435761) % 1_000_003).cast("long").alias("v"),
        ).alias("p"),
    )
    mono = {
        r["k"]: r["acc"]
        for r in rows.groupBy("k")
        .agg(F.array_sort(F.collect_list("p")).alias("ps"))
        .select(
            "k",
            F.aggregate(
                "ps", F.lit(None).cast("long"), _ewma_step
            ).alias("acc"),
        )
        .collect()
    }
    payload = F.struct(F.col("p")["t"].alias("t"), F.col("p")["v"].alias("v"))
    for s in (137, 500, 10_000):  # multi-segment, uneven tail, 1-round
        segd = {
            r["k"]: r["acc"]
            for r in segmented_fold(
                rows,
                ["k"],
                payload,
                F.lit(None).cast("long"),
                _ewma_step,
                max_segment_points=s,
            ).collect()
        }
        assert segd == mono, f"segment size {s} diverged"


def test_segmented_fold_empty_input(spark):
    from datamodel_clinicaldata_spark.operators.folds import segmented_fold

    empty = spark.range(0).select(
        F.col("id").alias("k"),
        F.struct(F.col("id").alias("t"), F.col("id").alias("v")).alias("p"),
    )
    out = segmented_fold(
        empty,
        ["k"],
        F.col("p"),
        F.lit(None).cast("long"),
        _ewma_step,
        max_segment_points=10,
    )
    assert out.count() == 0 and out.columns == ["k", "acc"]
