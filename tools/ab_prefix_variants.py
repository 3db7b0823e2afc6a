"""Alternating A/B/C/D over prefix_filtered_jaccard_pairs variants.

    python tools/ab_prefix_variants.py <sf_dir> <rounds>

V0 original (no pins) | V1 both pins lazy | V2 no pins + SHUFFLE_MERGE hint
on the candidate self-join (ReusedExchange) | V3 pre pin only (lazy).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datamodel_clinicaldata_spark.functions.text import word_shingles
from datamodel_clinicaldata_spark.operators.dedup import _prefix_index
from datamodel_clinicaldata_spark.operators.graph import truncate_lineage
from datamodel_clinicaldata_spark.operators.partitioning import (
    ensure_min_parallelism,
    source_rows_for_width,
)


def build(df, variant, id_col="doc_id", content_col="text", k=3, threshold=0.5):
    n_src = source_rows_for_width(df, None)
    df = ensure_min_parallelism(df)
    sh = (
        df.select(
            F.col(id_col),
            F.array_distinct(
                F.transform(
                    word_shingles(F.col(content_col), k), lambda x: F.xxhash64(x)
                )
            ).alias("__sh"),
        )
        .withColumn("__n", F.size("__sh"))
        .filter(F.col("__n") > 0)
    )
    if variant == "V1":
        sh = truncate_lineage(sh, eager=False)
    pre = _prefix_index(sh, id_col, threshold, n_src)
    if variant in ("V1", "V3"):
        pre = truncate_lineage(pre, eager=False)
    a, b = pre.alias("a"), pre.alias("b")
    if variant == "V2":
        b = b.hint("shuffle_merge")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    xa = sh.select(
        F.col(id_col).alias("id_a"), F.col("__sh").alias("__sha"), F.col("__n").alias("__na")
    )
    xb = sh.select(
        F.col(id_col).alias("id_b"), F.col("__sh").alias("__shb"), F.col("__n").alias("__nb")
    )
    inter = F.size(F.array_intersect(F.col("__sha"), F.col("__shb")))
    jac = inter / (F.col("__na") + F.col("__nb") - inter)
    return (
        cand.join(xa, "id_a")
        .join(xb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def main() -> None:
    sf_dir, rounds = sys.argv[1], int(sys.argv[2])
    from datamodel_clinicaldata_spark.session import get_spark
    from datamodel_clinicaldata_spark.sources.readers import read_table

    spark = get_spark("ab_prefix_variants")
    variants = ["V0", "V1", "V2", "V3"]
    times = {v: [] for v in variants}
    d = read_table(spark, sf_dir, "documents")
    for v in variants:  # warm each plan shape once
        build(d, v).write.mode("overwrite").format("noop").save()
    for r in range(rounds):
        for v in variants:
            spark.sparkContext.setJobDescription(f"{v}:{r}")
            t0 = time.monotonic()
            build(read_table(spark, sf_dir, "documents"), v).write.mode(
                "overwrite"
            ).format("noop").save()
            times[v].append(time.monotonic() - t0)
    for v in variants:
        print(
            f"ABVAR {v} min={min(times[v]):.3f} "
            f"runs={[round(t,2) for t in times[v]]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
