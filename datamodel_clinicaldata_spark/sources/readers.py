"""Sources: CSV (reference parity, S1/S2) and parquet (driver testdata).

Reference behavior being reproduced (SURVEY.md §2.1):
- S1: ``pd.read_csv(path)`` ×3 — header row, inferred types
  (``pandas_DataModel.py:51-53``).
- S2: ``pl.read_csv(path, try_parse_dates=True)`` — dates typed at load
  (``polars_DataModel.py:52-55``).

Spark-first translation: one CSV reader with an explicit pinned
``StructType`` so dates are typed at load (the polars shape) without the
double scan ``inferSchema`` costs; the pandas late-cast path (P3) exists as
an operator in ``operators.relational`` for parity testing.

At 100 TB the real source is columnar parquet; every reader here returns a
lazy DataFrame so Catalyst can push filters and prune columns into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datamodel_clinicaldata_spark.schemas import CLINICAL_SCHEMAS, TESTDATA_TABLES


def read_clinical_csv(
    spark: SparkSession, path_to_data: str, table: str, typed_dates: bool = True
) -> DataFrame:
    """Read one clinical CSV (``users``/``weights``/``treatments``).

    ``typed_dates=True`` mirrors polars' ``try_parse_dates=True`` (dates
    typed at load). ``typed_dates=False`` mirrors the pandas path: timestamp
    columns land as strings for the explicit P3 cast stage.
    """
    schema = CLINICAL_SCHEMAS[table]
    if not typed_dates:
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField(f.name, T.StringType() if isinstance(f.dataType, T.TimestampType) else f.dataType, f.nullable)
                for f in schema.fields
            ]
        )
    return spark.read.csv(
        os.path.join(path_to_data, f"{table}.csv"),
        header=True,
        schema=schema,
        timestampFormat="yyyy-MM-dd HH:mm:ss",
    )


def load_clinical_tables(
    spark: SparkSession, path_to_data: str, fmt: str = "csv"
) -> dict[str, DataFrame]:
    """Load the three clinical base tables (S1/S2 ×3)."""
    if fmt == "parquet":
        return {
            t: spark.read.parquet(os.path.join(path_to_data, f"{t}.parquet"))
            for t in CLINICAL_SCHEMAS
        }
    return {t: read_clinical_csv(spark, path_to_data, t) for t in CLINICAL_SCHEMAS}


# Event-time columns in the driver testdata whose parquet physical type is
# not stable across testdata generations: TIMESTAMP(NANOS) in some drops
# (rejected by a vanilla session → read as long via nanosAsLong, ÷1000 to
# µs), TIMESTAMP(MICROS) without timezone in others (inferred as
# TIMESTAMP_NTZ → cast to session-tz TIMESTAMP, value-preserving under the
# engine's pinned UTC session and required for watermarks/window()).
_EVENT_TS_COLUMNS = {"events": ("ts",)}


def _normalize_event_ts(df: DataFrame, col: str) -> DataFrame:
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        # Integer division — float division would lose ns precision
        # (2^53 < 1e18) and shift the resulting microsecond.
        return df.withColumn(col, F.expr(f"timestamp_micros(`{col}` div 1000)"))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata parquet table.

    Self-sufficient on ANY session (not just ``session.get_spark()``):
    TIMESTAMP(NANOS) testdata is rejected outright by a vanilla
    SparkSession (PARQUET_TYPE_ILLEGAL). The legacy conf below is
    runtime-settable and idempotent. It is set ONLY for tables listed in
    ``_EVENT_TS_COLUMNS`` — other reads never touch session state. For
    those tables the conf does stay set on the session afterwards
    (deliberately: the returned DataFrame is lazy, and Spark may consult
    the conf again when the scan executes, so an eager set/restore could
    flip it back mid-plan); any later TIMESTAMP(NANOS) parquet read on the
    same session therefore also comes back as long.
    """
    if name in _EVENT_TS_COLUMNS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _EVENT_TS_COLUMNS.get(name, ()):
        df = _normalize_event_ts(df, col)
    return df


def load_testdata(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load driver testdata tables as a name→DataFrame dict."""
    return {t: read_table(spark, sf_dir, t) for t in tables}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL surface."""
    for t in TESTDATA_TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSONL source. An explicit schema skips the inference pass (which
    reads the whole dataset once — never acceptable at 100 TB) and pins
    types against drift; inference is allowed only for exploration."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — same predicate-pushdown/column-pruning contract as
    parquet (pinned by the round-trip test)."""
    return spark.read.orc(path)
