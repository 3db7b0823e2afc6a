"""Arbitrary stateful processing on Spark 4's ``transformWithStateInPandas``.

The successor API to ``applyInPandasWithState`` (which
``streaming.stateful`` keeps for comparison): state is TYPED and
composable (named ValueState/ListState/MapState handles instead of one
opaque tuple), timers are first-class, and the state store must be
RocksDB (``spark.sql.streaming.stateStore.providerClass`` →
``RocksDBStateStoreProvider``) — the provider that makes 100 TB of
keyed state practical: state lives on executor disk with changelog
checkpointing, not in a JVM heap map.

Same contract as the v1 operator: a per-user running profile
(event count, value total) maintained across micro-batches.

Runtime dependency note: the transformWithState Python worker talks to
the JVM state server over protobuf; environments without
``google.protobuf`` (this container) can import and plan this module but
the query crashes at start — tests/test_streaming.py skips with that
reason, and ``streaming.stateful`` (applyInPandasWithState, no protobuf
dependency) remains the exercised stateful path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


class UserProfileProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._profile = handle.getValueState("profile", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = 0, 0.0
        if self._profile.exists():
            prev = self._profile.get()
            n, total = int(prev[0]), float(prev[1])
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._profile.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def user_profile_stream_v2(events: DataFrame) -> DataFrame:
    """Per-user running profile via transformWithStateInPandas; emits the
    updated profile row for every user seen in each micro-batch."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserProfileProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
