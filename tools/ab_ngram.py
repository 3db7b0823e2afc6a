"""Alternating A/B: old 3-pass ngram pair builder vs carried-size postings.

    python tools/ab_ngram.py <sf_dir> <rounds> <query> [query ...]

Variant A = OLD shape (separate `sizes` subtree joined back per side —
three corpus-shingle passes); variant B = current operator (per-doc
distinct-shingle count carried through the postings as struct(id, n)).
Both monkeypatch the name the query modules resolve at call time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _old_ngram_jaccard_pairs(
    df, content_col, id_col, k=3, threshold=0.5, max_postings=200, n_rows_est=None
):
    from datamodel_clinicaldata_spark.functions.text import word_shingles
    from datamodel_clinicaldata_spark.operators.dedup import _shingle_postings
    from datamodel_clinicaldata_spark.operators.partitioning import (
        ensure_min_parallelism,
        source_rows_for_width,
    )

    n_src = source_rows_for_width(df, n_rows_est)
    df = ensure_min_parallelism(df)
    sizes = df.select(
        F.col(id_col),
        F.size(F.array_distinct(word_shingles(F.col(content_col), k))).alias("n"),
    )
    idx = _shingle_postings(df, content_col, id_col, k, max_postings, n_src).select(
        "shingle", F.explode("ids").alias(id_col)
    )
    a, b = idx.alias("a"), idx.alias("b")
    pair_counts = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("__na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("__nb"))
    jac = F.col("__c") / (F.col("__na") + F.col("__nb") - F.col("__c"))
    return (
        pair_counts.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def main() -> None:
    sf_dir, rounds = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    import datamodel_clinicaldata_spark.queries_dedup as qd
    from datamodel_clinicaldata_spark.operators.dedup import ngram_jaccard_pairs
    from datamodel_clinicaldata_spark.registry import QUERIES
    from datamodel_clinicaldata_spark.session import get_spark

    new = ngram_jaccard_pairs
    spark = get_spark("ab_ngram")
    for n in names:
        QUERIES[n](spark, sf_dir).write.mode("overwrite").format("noop").save()
        times = {"A": [], "B": []}
        for r in range(rounds):
            for v in ("A", "B"):
                qd.ngram_jaccard_pairs = _old_ngram_jaccard_pairs if v == "A" else new
                spark.sparkContext.setJobDescription(f"{v}{r}:{n}")
                t0 = time.monotonic()
                QUERIES[n](spark, sf_dir).write.mode("overwrite").format("noop").save()
                times[v].append(time.monotonic() - t0)
        qd.ngram_jaccard_pairs = new
        print(
            f"ABNG {n} old_min={min(times['A']):.3f} new_min={min(times['B']):.3f} "
            f"A={[round(t,2) for t in times['A']]} B={[round(t,2) for t in times['B']]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
