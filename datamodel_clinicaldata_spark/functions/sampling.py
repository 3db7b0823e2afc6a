"""Deterministic-sampling key functions.

The sampler key is a Knuth multiplicative hash ``(key * 2654435761) % m``
— reproducible, partition-count-independent, and replayable in ANSI SQL so
a DuckDB oracle can verify the exact row set (``xxhash64`` has no DuckDB
twin).

ANSI-safety: Spark 4 runs ANSI mode by default, where a BIGINT overflow
*throws* rather than wraps — a raw ``key * 2654435761`` long multiply
crashes once keys exceed ~3.5e9 (i.e. exactly the 100 TB key ranges this
engine targets). The multiply therefore runs in exact DECIMAL arithmetic:
a 19-digit BIGINT times a 10-digit constant is at most 29 digits, well
inside DECIMAL(38,0), so the product is exact at ANY key range and equals
the mathematical integer the oracle computes with 128-bit HUGEINT.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH = 2654435761  # Knuth multiplicative-hash constant (2^32 * phi)


def knuth_key(col: Column | str) -> Column:
    """Exact ``key * KNUTH`` as DECIMAL(31,0) — never overflows, never
    throws under ANSI. Input must be a non-negative integral column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(20,0)") * F.lit(KNUTH).cast("decimal(11,0)")


def knuth_mod(col: Column | str, m: int) -> Column:
    """``(key * KNUTH) % m`` with exact decimal arithmetic; compare against
    integer literals directly (Spark widens the literal to decimal)."""
    return knuth_key(col) % F.lit(m)


def knuth_mod_sql(expr: str, m: int) -> str:
    """The DuckDB twin: 128-bit HUGEINT multiply — exact at any key range,
    same mathematical value as :func:`knuth_mod`."""
    return f"(CAST({expr} AS HUGEINT) * {KNUTH}) % {m}"
