"""Similarity-search queries over ``embeddings`` + DuckDB oracles.

Brute-force cosine top-k and exact threshold pairs are oracle-matched
(identical expression shape + round(6) on both engines). The LSH and IVF
approximate paths have no SQL twin (rows-only driver check; recall is
asserted against the brute-force baseline in tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datamodel_clinicaldata_spark.operators.similarity import (
    cosine_neardup_pairs,
    cosine_topk_bruteforce,
    ivf_topk,
)
from datamodel_clinicaldata_spark.registry import register
from datamodel_clinicaldata_spark.sources.readers import read_table

_COS = (
    "round(list_inner_product(a.v, b.v) / "
    "sqrt(list_inner_product(a.v, a.v) * list_inner_product(b.v, b.v)), 6)"
)


@register(
    "similarity_topk_bruteforce",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS vec_id, {_COS} AS cos_sim
      FROM (SELECT * FROM e WHERE vec_id < 5) a
      JOIN e b ON true
    )
    SELECT query_id, vec_id, cos_sim, rank FROM (
      SELECT query_id, vec_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for query vectors vec_id < 5 over the corpus."""
    e = read_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_bruteforce(e, queries, k=10)


@register(
    "similarity_neardup_exact",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {_COS} >= 0.45
    """,
)
def similarity_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs cosine ≥ 0.45 (threshold chosen to be non-trivial on
    the testdata distribution, max observed ≈ 0.51)."""
    e = read_table(spark, sf_dir, "embeddings")
    from datamodel_clinicaldata_spark.functions.vectors import cosine

    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.45)
    )


@register("similarity_neardup_lsh")  # rows-only: approximate blocking path
def similarity_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH-blocked cosine ≥ 0.45 pairs (the 100 TB path:
    bucketed self-join instead of all-pairs crossJoin). Threshold matches
    ``similarity_neardup_exact`` so recall is measurable on this corpus
    (the synthetic embeddings are near-orthogonal — max cos ≈ 0.51 — so a
    production 0.9 near-dup threshold would return an empty, untestable
    result). bits=4 × 16 tables → per-pair miss ≈ (1−0.65⁴)¹⁶ ≈ 4% at
    cos 0.45; recall is asserted against the exact pairs in tests."""
    e = read_table(spark, sf_dir, "embeddings")
    return cosine_neardup_pairs(e, threshold=0.45, n_tables=16, bits=4)


@register("similarity_ivf_topk")  # rows-only: approximate ANN path
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF two-stage ANN, nprobe=4 of 16 centroids, seeds tightened with
    one Lloyd iteration (recall vs brute force asserted in tests)."""
    e = read_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(e, queries, k=10, n_centroids=16, nprobe=4, refine_iters=1)


@register(
    "embedding_norm_stats",
    """
    WITH n AS (
      SELECT label,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
               AS nrm
      FROM embeddings
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(nrm), 4) AS avg_norm,
           round(min(nrm), 4) AS min_norm,
           round(max(nrm), 4) AS max_norm
    FROM n GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm profile of the embedding corpus (the sanity scan
    run before any cosine-based dedup: un-normalized vectors silently
    break cosine-threshold semantics). Fold order inside F.aggregate
    matches DuckDB's list_sum (array order), so the doubles agree
    bitwise before rounding."""
    from datamodel_clinicaldata_spark.functions.vectors import l2_norm

    e = read_table(spark, sf_dir, "embeddings")
    n = e.select("label", l2_norm(F.col("embedding")).alias("nrm"))
    return n.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.round(F.avg("nrm"), 4).alias("avg_norm"),
        F.round(F.min("nrm"), 4).alias("min_norm"),
        F.round(F.max("nrm"), 4).alias("max_norm"),
    )
