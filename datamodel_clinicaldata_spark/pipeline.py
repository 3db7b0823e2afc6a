"""The flagship clinical cohort pipeline + CLI — mirror of the reference's
``data_pipeline`` (``pandas_DataModel.py:34-161`` / ``polars_DataModel.py:35-166``).

Stages (reference order, SURVEY.md §3.1): scan ×3 → left join ×2 → key-drop
→ rename → cast → [sort becomes per-window orderBy] → derive week/month →
five windowed metrics → filter → distinct → return DataFrame.

Filter placement is load-bearing: filters run AFTER the window metrics
(``pandas_DataModel.py:154``), so PSW/WIR/TBWL are computed over the
unfiltered population. Catalyst will not push predicates through Window
operators (they are not on the partition keys), so the semantics survive
optimization by default (SURVEY.md §4.1).

``run_cohort_pipeline`` is the engine core (DataFrames in, DataFrame out);
``data_pipeline`` wires it to clinical CSV/parquet sources exactly like the
reference CLI; ``clinical_standins_from_testdata`` casts the driver's
TPC-H-ish tables into the clinical roles (FIXTURES.md §5) so the same query
runs against /root/testdata.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datamodel_clinicaldata_spark.operators.relational import (
    assemble_star,
    distinct_rows,
    filters,
    rename_columns,
)
from datamodel_clinicaldata_spark.operators.windows import (
    COHORT_CHOICES,
    with_cohort_metrics,
)
from datamodel_clinicaldata_spark.sources.readers import load_clinical_tables, read_table

# S3 — the reference's "# Check" projection (pandas_DataModel.py:156-160).
CHECK_COLUMNS = ["Weight", "week", "WIR", "PSW", "TSW", "treatment_TBWL", "patient_TBWL"]


def run_cohort_pipeline(
    users: DataFrame,
    weights: DataFrame,
    treatments: DataFrame,
    cohort: str = "week",
    gender: str = "all",
    min_age: int = 18,
    max_age: int = 72,
    clinic_id: int | None = 5066,
    keep_tew: bool = False,
    final_distinct: bool = True,
    strict_w8: bool = False,
) -> DataFrame:
    """The whole query as one composable function.

    ``clinic_id=None`` skips the clinic filter (engine extension beyond the
    reference signature — needed for stand-in tables whose clinic analog
    doesn't contain 5066). ``final_distinct`` mirrors the .py-script
    asymmetry: pandas dedups (``pandas_DataModel.py:161``), polars doesn't
    (``polars_DataModel.py:166``); pandas is the canon default.
    ``strict_w8`` selects exact W8 replication including the reference's
    cross-user diff(-1) leak — see ``with_cohort_metrics``.
    """
    df = assemble_star(users, weights, treatments)
    df = rename_columns(df)
    df = with_cohort_metrics(
        df, cohort=cohort, keep_tew=keep_tew, strict_w8=strict_w8
    )
    if gender != "all":
        df = df.filter(F.col("Gender") == gender)
    df = df.filter(F.col("Age").between(min_age, max_age))
    if clinic_id is not None:
        df = df.filter(F.col("ClinicID") == clinic_id)
    if final_distinct:
        df = distinct_rows(df)
    return df


def data_pipeline(
    spark: SparkSession,
    path_to_data: str,
    cohort: str = "week",
    gender: str = "all",
    min_age: int = 18,
    max_age: int = 72,
    clinic_id: int = 5066,
    fmt: str = "csv",
) -> DataFrame:
    """CLI-equivalent entry: identical signature/defaults to the reference
    (``pandas_DataModel.py:34,164-186``; usage ``README.md:31-41``)."""
    t = load_clinical_tables(spark, path_to_data, fmt=fmt)
    return run_cohort_pipeline(
        t["users"],
        t["weights"],
        t["treatments"],
        cohort=cohort,
        gender=gender,
        min_age=min_age,
        max_age=max_age,
        clinic_id=clinic_id,
    )


def clinical_standins_from_testdata(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Cast driver testdata into the clinical roles (FIXTURES.md §5).

    - users     ← customer  (c_custkey PK; c_mktsegment as Gender;
                  c_nationkey as ClinicID; deterministic synthetic Age)
    - weights   ← events    (user_id FK; value as Weight; ts as CreatedDate;
                  UpdatedDate nulled on 'error' events to exercise WIR's
                  non-null-count semantics, SURVEY.md §2.5 W3)
    - treatments ← orders   (one episode per customer: earliest order date,
                  min priority — deterministic under ties)

    Every expression here is chosen to be exactly expressible in ANSI SQL so
    the DuckDB oracle can replay it verbatim.
    """
    customer = read_table(spark, sf_dir, "customer")
    events = read_table(spark, sf_dir, "events")
    orders = read_table(spark, sf_dir, "orders")

    users = customer.select(
        F.col("c_custkey").cast("string").alias("UID"),
        F.col("c_name").alias("Name"),
        F.col("c_mktsegment").alias("Gender"),
        (F.col("c_custkey") % 60 + 15).cast("long").alias("Age"),
        F.col("c_nationkey").cast("long").alias("ClinicID"),
        F.col("c_acctbal"),
    )
    weights = events.select(
        F.col("user_id").cast("string").alias("MasterUserID"),
        F.col("value").alias("Weight"),
        F.col("ts").alias("CreatedDate"),
        F.when(F.col("event_type") != "error", F.col("ts")).alias("UpdatedDate"),
    )
    treatments = orders.groupBy(
        F.col("o_custkey").cast("string").alias("MasterUserID")
    ).agg(
        F.min("o_orderpriority").alias("TreatmentTypeID"),
        F.min("o_orderdate").alias("StartDate"),
    )
    return users, weights, treatments


def flagship_query(
    spark: SparkSession, sf_dir: str, cohort: str = "week"
) -> DataFrame:
    """The end-to-end slice (SURVEY.md §7.2) over driver testdata: scan,
    2 left joins, rename, derived buckets, 5 windowed metrics, filters,
    distinct — 80% of the reference operator inventory in one query."""
    users, weights, treatments = clinical_standins_from_testdata(spark, sf_dir)
    return run_cohort_pipeline(
        users,
        weights,
        treatments,
        cohort=cohort,
        gender="all",
        min_age=15,
        max_age=74,
        clinic_id=None,
    )


def flagship_query_observed(
    spark: SparkSession, sf_dir: str, cohort: str = "week"
):
    """Flagship pipeline wired with the Observation API — per-action
    pipeline metrics (row count, null-weight count, age span) collected
    ON the executors DURING the normal action, no second pass and no
    extra job: the production observability pattern (a separate
    ``count()`` for monitoring would re-run the whole 100 TB plan).
    Returns ``(df, observation)``; read ``observation.get`` AFTER an
    action on ``df``."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("flagship_metrics")
    df = flagship_query(spark, sf_dir, cohort=cohort)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("Weight").isNull().cast("long")).alias("n_null_weight"),
        F.min("Age").alias("min_age"),
        F.max("Age").alias("max_age"),
    )
    return observed, obs


def main() -> None:
    """argparse CLI — flag-for-flag mirror of ``pandas_DataModel.py:164-186``."""
    p = argparse.ArgumentParser(description="Clinical cohort weight-loss pipeline (PySpark)")
    p.add_argument("--path_to_data", required=True)
    p.add_argument("--cohort", default="week", choices=list(COHORT_CHOICES))
    p.add_argument("--gender", default="all", choices=["all", "Male", "Female"])
    p.add_argument("--min_age", type=int, default=18)
    p.add_argument("--max_age", type=int, default=72)
    p.add_argument("--ClinicID", type=int, default=5066)
    p.add_argument("--format", default="csv", choices=["csv", "parquet"])
    args = p.parse_args()

    from datamodel_clinicaldata_spark.session import get_spark

    spark = get_spark("clinical-cohort-cli")
    df = data_pipeline(
        spark,
        args.path_to_data,
        cohort=args.cohort,
        gender=args.gender,
        min_age=args.min_age,
        max_age=args.max_age,
        clinic_id=args.ClinicID,
        fmt=args.format,
    )
    # S3 — the reference's stdout check projection.
    df.select(*CHECK_COLUMNS).show(20, truncate=False)


if __name__ == "__main__":
    main()
