"""lakeflow — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL/CDC pipeline
(``Implementing-a-Data-Lake-Using-MongoDB-Integrated-with-BigQuery``)
as an idiomatic Spark DataFrame / Spark SQL / Structured Streaming
operator library, generalized into a large-scale data-pipeline engine
(dedup, similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``    — tuned SparkSession builder (AQE, Arrow, broadcast)
- ``schemas``    — StructTypes for the reference's data model
- ``sources``    — batch/stream readers over the lake (parquet/json/CDC)
- ``operators``  — relational + pipeline operators (SURVEY.md §2)
- ``functions``  — scalar/vector column expression helpers
- ``plans``      — pipeline assemblies (flagship fact-load, audits)
- ``streaming``  — Structured Streaming CDC merge & windowed aggs
"""

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
