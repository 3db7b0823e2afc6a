"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) — a
deterministic synthetic-events generator.

Why this exists: the reference reads flat files only; a 100 TB pipeline
also ingests from systems with no built-in connector. Spark 4's Python
DataSource API is the sanctioned extension point — implement
``DataSource``/``DataSourceReader``, and the source plugs into the
normal ``spark.read.format(...)`` surface with real partition-level
parallelism (one ``read()`` call per ``InputPartition``, executed on the
executors, Arrow-batched back). This source generates load-test /
fixture event data from a seeded LCG, so every read of the same
(rows, partitions, seed) is bit-identical — a property file fixtures
can't give you at arbitrary scale (no bytes stored, any size generated).

Registration: ``spark.dataSource.register(SyntheticEventsDataSource)``;
then ``spark.read.format("synthetic_events").option("rows", n)...``.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


def _lcg(state: int) -> int:
    return (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 7))
        self.n_users = int(options.get("users", 100))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition: InputPartition):
        pid = partition.value
        per = -(-self.rows // self.num_partitions)
        lo = pid * per
        hi = min(self.rows, lo + per)
        for i in range(lo, hi):
            # Per-row state derived from (seed, i), not carried across
            # rows: any partition split yields identical content.
            s = _lcg(self.seed * 0x9E3779B97F4A7C15 + i)
            user = s % self.n_users
            s = _lcg(s)
            etype = _EVENT_TYPES[s % len(_EVENT_TYPES)]
            s = _lcg(s)
            value = (s % 1_000_000) / 1000.0
            yield (i, user, etype, value)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Micro-batch stream over the same deterministic generator: offsets
    are plain row indices, each ``latestOffset`` poll advances by
    ``batch_rows`` — the full offset lifecycle (initial → latest →
    partitions(start, end) → read → commit) the engine checkpoints for
    exactly-once. Content for row *i* is identical to the batch reader's,
    so stream output equals a batch read of the covered range."""

    def __init__(self, options: dict) -> None:
        self.batch_rows = int(options.get("batch_rows", 100))
        self.num_partitions = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 7))
        self.n_users = int(options.get("users", 100))
        self.max_rows = int(options.get("rows", 1000))
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        self._latest = min(self.max_rows, self._latest + self.batch_rows)
        return {"row": self._latest}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["row"], end["row"]
        if hi <= lo:
            return [RangePartition(lo, lo)]
        per = -(-(hi - lo) // self.num_partitions)
        return [
            RangePartition(p_lo, min(hi, p_lo + per))
            for p_lo in range(lo, hi, per)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            s = _lcg(self.seed * 0x9E3779B97F4A7C15 + i)
            user = s % self.n_users
            s = _lcg(s)
            etype = _EVENT_TYPES[s % len(_EVENT_TYPES)]
            s = _lcg(s)
            value = (s % 1_000_000) / 1000.0
            yield (i, user, etype, value)

    def commit(self, end: dict) -> None:
        pass  # nothing external to acknowledge — offsets live in the checkpoint


class RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end
