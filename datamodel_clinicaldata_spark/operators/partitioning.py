"""Partition-layout helpers shared by compute-heavy operators.

At cluster scale a parquet scan arrives pre-split (one partition per
file split), so per-row compute — minhash signatures, sign-bucket
hashing, shingle inversion — parallelizes for free. A SMALL input (one
file, one row group) arrives as ONE partition, and because the heavy
work is a projection (no shuffle before it), it would run on a single
core regardless of cluster size. These helpers make that explicit
instead of leaving it to luck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer partitions
    than the session's default parallelism. On a real many-split scan
    this is a no-op (no exchange is added); on a single-file input it
    spreads downstream projections across cores for one narrow shuffle
    of the raw rows. Call it at the top of operators whose per-row
    compute dominates (signature hashing, vector math) — not on cheap
    scans, where the exchange would cost more than it saves.

    CONTRACT: pass BARE SCAN inputs only. The partition probe
    (``df.rdd.getNumPartitions()``) finalizes the physical plan, which
    under AQE can eagerly execute upstream shuffle stages of a derived
    DataFrame (silently doubling work) and is unsupported under Spark
    Connect. Post-shuffle frames already carry shuffle-partition
    parallelism — skip this helper for them (operators that accept
    derived inputs expose an ``ensure_parallelism=False`` switch)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
