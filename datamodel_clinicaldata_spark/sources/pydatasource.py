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

_LCG_A = 6364136223846793005
_LCG_C = 1442695040888963407
_MIX = 0x9E3779B97F4A7C15


def _lcg(state: int) -> int:
    return (state * _LCG_A + _LCG_C) % (1 << 64)


def _gen_batches(lo: int, hi: int, seed: int, n_users: int, batch: int = 65536):
    """Vectorized generator: yields pyarrow RecordBatches for rows
    [lo, hi) — bit-identical to the scalar per-row recurrence (numpy
    uint64 arithmetic wraps mod 2^64 exactly like the Python int mod),
    ~100× the throughput of per-row tuple yields. Per-row state derives
    from (seed, i), not from the previous row, which is precisely what
    makes the generator both splittable AND vectorizable."""
    import numpy as np
    import pyarrow as pa

    a = np.uint64(_LCG_A)
    c = np.uint64(_LCG_C)
    types = np.asarray(_EVENT_TYPES)
    with np.errstate(over="ignore"):
        for b_lo in range(lo, hi, batch):
            i = np.arange(b_lo, min(hi, b_lo + batch), dtype=np.uint64)
            s = (np.uint64(seed) * np.uint64(_MIX) + i) * a + c
            user = s % np.uint64(n_users)
            s = s * a + c
            etype = types[(s % np.uint64(len(_EVENT_TYPES))).astype(np.int64)]
            s = s * a + c
            value = (s % np.uint64(1_000_000)).astype(np.float64) / 1000.0
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(i.astype(np.int64)),
                    pa.array(user.astype(np.int64)),
                    pa.array(etype),
                    pa.array(value),
                ],
                names=["event_id", "user_id", "event_type", "value"],
            )


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
        # Arrow batches, not per-row tuples: the engine accepts RecordBatch
        # yields and skips per-row pickling entirely — at 50M+ probe rows
        # the generator must not be the measurement.
        yield from _gen_batches(lo, hi, self.seed, self.n_users)


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
        # Restart-safety: after a checkpoint restore the engine replans
        # from its committed offset, but a fresh reader instance starts
        # with _latest = 0. Seed _latest from the engine-supplied offsets
        # so latestOffset never regresses below a committed point — a
        # regressing offset log would eventually re-emit committed rows
        # and break the exactly-once contract this docstring claims.
        self._latest = max(self._latest, start["row"], end["row"])
        lo, hi = start["row"], end["row"]
        if hi <= lo:
            return [RangePartition(lo, lo)]
        per = -(-(hi - lo) // self.num_partitions)
        return [
            RangePartition(p_lo, min(hi, p_lo + per))
            for p_lo in range(lo, hi, per)
        ]

    def read(self, partition):
        yield from _gen_batches(
            partition.start, partition.end, self.seed, self.n_users
        )

    def commit(self, end: dict) -> None:
        # Nothing external to acknowledge — offsets live in the engine's
        # checkpoint — but seed the generator cursor here too (same
        # restart-safety as partitions(): _latest must never fall behind
        # a committed point, or the source would re-emit committed rows).
        self._latest = max(self._latest, end["row"])


class RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end
