"""Query registry — every implemented operator exposed as a named query
with a DuckDB-oracle SQL twin (driver t2 contract, ``__spark_entry__.py``).

Each entry: ``QUERIES[name]`` is ``(spark, sf_dir) -> DataFrame`` built with
the engine's operators; ``ORACLE_SQL[name]`` is ANSI SQL DuckDB runs over
the same parquet tables. Column names (and, where feasible, types) are
aligned on both sides because the driver sorts columns by name before
value-hashing. Aggregates over doubles are ROUNDed identically on both
sides to keep IEEE accumulation-order noise out of the hash.

Non-SQL-expressible ops (MinHash-LSH banding, streaming) register a query
with no oracle entry → driver records the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# Import modules for their registration side effects.
from datamodel_clinicaldata_spark import queries_clinical  # noqa: E402,F401
from datamodel_clinicaldata_spark import queries_csv  # noqa: E402,F401
from datamodel_clinicaldata_spark import queries_dedup  # noqa: E402,F401
from datamodel_clinicaldata_spark import queries_multimodal  # noqa: E402,F401
from datamodel_clinicaldata_spark import queries_relational  # noqa: E402,F401
from datamodel_clinicaldata_spark import queries_similarity  # noqa: E402,F401
from datamodel_clinicaldata_spark import queries_streaming  # noqa: E402,F401
from datamodel_clinicaldata_spark import queries_text  # noqa: E402,F401
from datamodel_clinicaldata_spark import queries_tpch  # noqa: E402,F401
from datamodel_clinicaldata_spark import queries_trainingdata  # noqa: E402,F401


def interleaved_by_family(names: list[str]) -> list[str]:
    """Round-robin the given query names across their registering modules.

    Pure ordering helper — the registry itself stays in registration
    order. A caller that samples only a prefix of the inventory (e.g. a
    harness with a query cap) can use this so any prefix of length >=
    #families covers every family. Computed lazily from the CURRENT
    registry state, so queries registered after import are included.
    """
    by_family: dict[str, list[str]] = {}
    for name in names:
        by_family.setdefault(QUERIES[name].__module__, []).append(name)
    order: list[str] = []
    queues = list(by_family.values())
    while queues:
        for q in list(queues):
            order.append(q.pop(0))
            if not q:
                queues.remove(q)
    return order
