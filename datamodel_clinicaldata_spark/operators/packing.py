"""Sequence packing — assigning documents to fixed-token-budget training
shards/bins. Two strategies:

- ``quota_chunk_bins``: streaming cumulative-sum chunking. Bin boundary =
  every time the running token count crosses a multiple of the budget.
  Pure window arithmetic (one shuffle on the partition key, whole-stage
  codegen), exactly SQL-expressible — so it carries the DuckDB oracle.
  Bins may overflow by at most one document; that is the documented
  contract (it is the strategy GPU-side packers use when the stream order
  is fixed).
- ``greedy_pack_bins``: classic greedy reset packing (open a new bin when
  adding the next doc would exceed the budget). Needs running *resettable*
  state, which no SQL window frame expresses — implemented per-group with
  ``applyInPandas`` (Arrow-batched; one shuffle on the group key, then
  O(group) python per group). Registered rows-only.

Scale notes: both shapes shuffle ONLY (key, doc_id, n_tokens) — never the
text payload; bin assignment joins back to the corpus by doc_id if the
caller needs payloads. Group key choice (``source``) bounds the state any
single task holds; at 100 TB the per-source stream is further split by
date-partition so no group exceeds one task's memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quota_chunk_bins(
    df: DataFrame,
    size_col: str,
    order_col: str,
    group_col: str,
    budget: int,
) -> DataFrame:
    """bin_id = floor(exclusive-cumsum(size) / budget) per group, in
    deterministic order_col order."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size_col).over(w)
    return df.select(
        order_col,
        group_col,
        F.col(size_col).cast("long").alias(size_col),
        F.floor((cum - F.col(size_col)) / F.lit(budget)).cast("long").alias("bin_id"),
    )


def greedy_pack_bins(
    df: DataFrame,
    size_col: str,
    order_col: str,
    group_col: str,
    budget: int,
) -> DataFrame:
    """Greedy reset packing per group: bins are filled in order_col order;
    a document that would overflow the current bin opens the next one.
    Every bin except possibly one-doc oversized bins holds ≤ budget tokens.
    """
    import pandas as pd

    out_schema = (
        f"{order_col} long, {group_col} string, {size_col} long, bin_id long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        bins, filled, cur = [], 0, 0
        for size in pdf[size_col]:
            if filled > 0 and filled + size > budget:
                cur += 1
                filled = 0
            filled += int(size)
            bins.append(cur)
        return pd.DataFrame(
            {
                order_col: pdf[order_col].astype("int64"),
                group_col: pdf[group_col],
                size_col: pdf[size_col].astype("int64"),
                "bin_id": pd.Series(bins, dtype="int64"),
            }
        )

    slim = df.select(order_col, group_col, F.col(size_col).cast("long").alias(size_col))
    return slim.groupBy(group_col).applyInPandas(pack, schema=out_schema)


def length_bucket_batches(
    df: DataFrame,
    size_col: str,
    id_col: str,
    boundaries: tuple[int, ...] = (64, 128, 256, 512),
    token_budget: int = 4096,
    n_shards: int = 8,
) -> DataFrame:
    """Length-bucketed batching: group documents of similar token length
    into fixed-count batches so per-batch padding (to the longest member)
    wastes the least compute — the dynamic-batching strategy of every
    sequence trainer. Bucket b spans [boundaries[b-1], boundaries[b]);
    its batch size is ``token_budget / upper_bound`` (longer sequences →
    smaller batches → roughly constant padded tokens per batch).

    Scale shape: batch formation needs a sequential row_number within a
    bucket, so each bucket is first split into ``n_shards`` deterministic
    shards (``id % n_shards``) and batches form within (bucket, shard) —
    parallelism = buckets × shards instead of a serial scan per bucket,
    the standard sharded-batching layout. One shuffle, carrying only
    (id, n_tokens); per-batch stats aggregate on the same partitioning.
    """
    ups = list(boundaries) + [None]  # last bucket open-ended
    bucket = F.lit(len(boundaries)).cast("long")
    for b in range(len(boundaries) - 1, -1, -1):
        bucket = F.when(F.col(size_col) < boundaries[b], F.lit(b).cast("long")).otherwise(bucket)
    # batch size per bucket: budget over the bucket's padding target (its
    # upper bound; the open tail bucket uses 2x the last boundary)
    bsize = F.lit(max(1, token_budget // (boundaries[-1] * 2))).cast("long")
    for b in range(len(boundaries) - 1, -1, -1):
        bsize = F.when(
            F.col("bucket_id") == b, F.lit(max(1, token_budget // ups[b])).cast("long")
        ).otherwise(bsize)

    slim = df.select(
        F.col(id_col), F.col(size_col).cast("long").alias(size_col)
    ).withColumn("bucket_id", bucket).withColumn(
        "shard", (F.col(id_col) % n_shards).cast("long")
    )
    w = Window.partitionBy("bucket_id", "shard").orderBy(
        F.col(size_col).asc(), F.col(id_col).asc()
    )
    assigned = (
        slim.withColumn("__rn", F.row_number().over(w))
        .withColumn("__bsize", bsize)
        # integer division end-to-end (advice r5): double-divide-then-
        # truncate is only exact below 2^53 and drags a float into an
        # otherwise integer pipeline; `div` matches the oracle's `//`.
        .withColumn("batch_idx", F.expr("CAST(__rn - 1 AS BIGINT) div __bsize"))
        .drop("__bsize")
    )
    return assigned.groupBy("bucket_id", "shard", "batch_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(size_col).cast("long").alias("sum_tokens"),
        F.max(size_col).cast("long").alias("max_tokens"),
        (F.max(size_col) * F.count(F.lit(1))).cast("long").alias("padded_tokens"),
    )
