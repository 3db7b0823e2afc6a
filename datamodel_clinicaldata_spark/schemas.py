"""Explicit schemas — no inference anywhere.

Clinical schemas mirror the reference inputs exactly (recovered from the
captured ``.info()`` outputs: ``pandas_DataModel.ipynb#cell2-out`` /
``#cell3-out`` / ``#cell4-out``; see SURVEY.md §1.2 and FIXTURES.md).
CSV ``inferSchema`` is a double scan and type-unstable at 100 TB — we pin
``StructType`` per table instead (SURVEY.md §1.5).
"""

from __future__ import annotations

from pyspark.sql import types as T

# users.csv — 13 columns (pandas_DataModel.ipynb#cell2-out).
# loginId is the all-null-column edge case: kept as a typed null DoubleType
# (pandas infers float64 for a fully-null column), never dropped.
USERS_SCHEMA = T.StructType(
    [
        T.StructField("UID", T.StringType(), False),
        T.StructField("Name", T.StringType(), True),
        T.StructField("LastName", T.StringType(), True),
        T.StructField("Gender", T.StringType(), True),
        T.StructField("Unit", T.LongType(), True),
        T.StructField("Birthday", T.TimestampType(), True),
        T.StructField("Age", T.LongType(), True),
        T.StructField("Height", T.LongType(), True),
        T.StructField("CreatedDate", T.TimestampType(), True),
        T.StructField("IsActive", T.BooleanType(), True),
        T.StructField("ClinicID", T.LongType(), True),
        T.StructField("loginId", T.DoubleType(), True),
        T.StructField("success", T.BooleanType(), True),
    ]
)

# weights.csv — 13 columns (pandas_DataModel.ipynb#cell3-out).
WEIGHTS_SCHEMA = T.StructType(
    [
        T.StructField("MasterUserID", T.StringType(), False),
        T.StructField("Weight", T.DoubleType(), True),
        T.StructField("BMI", T.DoubleType(), True),
        T.StructField("BodyFat", T.DoubleType(), True),
        T.StructField("BodyWater", T.DoubleType(), True),
        T.StructField("Bone", T.DoubleType(), True),
        T.StructField("VisceralFat", T.DoubleType(), True),
        T.StructField("BMR", T.DoubleType(), True),
        T.StructField("MuscleMass", T.DoubleType(), True),
        T.StructField("CreatedDate", T.TimestampType(), True),
        T.StructField("UpdatedDate", T.TimestampType(), True),
        T.StructField("IsActive", T.BooleanType(), True),
        T.StructField("IsDelete", T.BooleanType(), True),
    ]
)

# treatments.csv — 3 columns (pandas_DataModel.ipynb#cell4-out).
TREATMENTS_SCHEMA = T.StructType(
    [
        T.StructField("MasterUserID", T.StringType(), False),
        T.StructField("TreatmentTypeID", T.LongType(), True),
        T.StructField("StartDate", T.TimestampType(), True),
    ]
)

CLINICAL_SCHEMAS: dict[str, T.StructType] = {
    "users": USERS_SCHEMA,
    "weights": WEIGHTS_SCHEMA,
    "treatments": TREATMENTS_SCHEMA,
}

# Driver-generated TPC-H-ish testdata (TESTDATA.md); parquet carries its own
# schema, this list is the catalog of table names.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
