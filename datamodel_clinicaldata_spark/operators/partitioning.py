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


def ensure_min_parallelism(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition ONLY when the input has fewer partitions than the
    session's default parallelism. On a real many-split scan this is a
    no-op (no exchange is added); on a single-file input it spreads
    downstream projections across cores for one narrow shuffle of the
    raw rows. Call it at the top of operators whose per-row compute
    dominates (signature hashing, shingle/k-gram inversion, vector
    math) — not on cheap scans, where the exchange would cost more than
    it saves. Text-expansion operators are the canonical case: ~10³-10⁴
    CPU ops per input BYTE breaks the byte-proportionality Spark's file
    splits assume (measured 5.4 s → 1.4 s on ``dedup_winnowing_pairs``
    at sf0.1, whose ~10M-md5 postings build otherwise runs on the
    scan's single partition).

    With ``keys``, hash-partitions on them instead of round-robin:
    ``GenerateExec`` (explode) preserves its child's output
    partitioning, so a downstream ``groupBy(keys)`` — or a window
    partitioned by them — reuses the exchange and the EXPLODED frame
    (orders of magnitude larger than the input) never shuffles.
    Order-insensitive plans only: repartition reorders rows.

    CONTRACT: pass BARE SCAN inputs only. The partition probe
    (``df.rdd.getNumPartitions()``) finalizes the physical plan, which
    under AQE can eagerly execute upstream shuffle stages of a derived
    DataFrame (silently doubling work) and is unsupported under Spark
    Connect. Post-shuffle frames already carry shuffle-partition
    parallelism — skip this helper for them (operators that accept
    derived inputs expose an ``ensure_parallelism=False`` switch)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, *keys) if keys else df.repartition(target)
    return df


def zorder_key(
    cols: list,
    ranges: list[tuple[float, float]],
    bits: int = 16,
):
    """Z-order (Morton) key over N numeric columns: each column is
    min/max-normalized into ``bits`` levels and the level bits are
    INTERLEAVED, so records close in EVERY dimension get close keys —
    sorting files by this key gives parquet footers tight min/max boxes
    in all dimensions at once, where a lexicographic sort only prunes
    its leading column. ``ranges`` are the (min, max) per column —
    explicit, because at 100 TB you take them from table statistics, not
    a scan; N·bits must stay ≤ 62.

    Pure JVM-side bit arithmetic (shiftright/and/or per level — no UDF);
    the ``bits``·N-term expression is built once at plan time."""
    from pyspark.sql import functions as F

    d = len(cols)
    if d * bits > 62:
        raise ValueError(f"{d} cols × {bits} bits exceeds the 62-bit budget")
    levels = (1 << bits) - 1
    scaled = []
    for c, (lo, hi) in zip(cols, ranges):
        c = F.col(c) if isinstance(c, str) else c
        span = float(hi - lo) or 1.0
        q = F.least(
            F.lit(levels).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                F.floor((c.cast("double") - float(lo)) / span * levels).cast("long"),
            ),
        )
        scaled.append(q)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), b * d + i)
            )
    return z
