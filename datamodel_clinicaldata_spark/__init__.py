"""datamodel_clinicaldata_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference clinical-analytics data model (SwethaSrikari/DataModel-ClinicalData,
surveyed in SURVEY.md), re-expressed Spark-first:

- the full clinical cohort pipeline (multi-source ingest, star-schema
  assembly via left joins, rename/cast, derived week/month buckets, five
  windowed cohort metrics, parameterized filters, distinct) as composable
  ``DataFrame -> DataFrame`` operators plus a SQL surface;
- large-scale training-data-pipeline extensions: exact/near deduplication,
  similarity search over embeddings, text analysis, multimodal binary
  columns, and Structured Streaming analogs.

Everything is declarative DataFrame/SQL so Catalyst + AQE pick the physical
plan; zero Python UDFs are needed for reference parity (SURVEY.md §2.6).
"""

from datamodel_clinicaldata_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
