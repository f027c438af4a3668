"""External-system connectors: MongoDB (raw zone) and BigQuery
(structured zone) — the two systems the reference pipeline bridges.

The reference talks to both with hand-rolled clients and generated SQL
strings (``src/process_insert_update_weather_data.py:110-127``,
``src/ingest_weather_data.py:94-116``). Spark-natively, both are
DataFrame connectors:

- MongoDB: the official Spark connector (``format("mongodb")``) with
  aggregation-pipeline pushdown; the change stream (CDC, reference S8)
  maps to ``spark.readStream.format("mongodb")``.
- BigQuery: the spark-bigquery connector (``format("bigquery")``) with
  Storage Read API scans + filter/column pushdown; appends land via
  the Storage Write API — NO DML string generation, the typed
  DataFrame IS the contract (the reference's quoting bug at
  ``src/process_insert_places_data.py:63`` cannot exist here).

Connector jars and live services are not available in this
environment; these builders construct the fully-configured readers /
writers and fail with a clear error only at execution time. The
parquet two-zone lake (sources.tables) is the hermetic stand-in used
by tests and the bench.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamReader


class ConnectorUnavailable(RuntimeError):
    pass


def mongo_collection_reader(
    spark: SparkSession,
    connection_uri: str,
    database: str,
    collection: str,
):
    """Batch scan of a MongoDB collection (reference S5,
    ``src/process_insert_places_data.py:20-25``). Column pruning and
    filters push down into the aggregation pipeline."""
    return (
        spark.read.format("mongodb")
        .option("spark.mongodb.read.connection.uri", connection_uri)
        .option("spark.mongodb.read.database", database)
        .option("spark.mongodb.read.collection", collection)
    )


def mongo_change_stream_reader(
    spark: SparkSession,
    connection_uri: str,
    database: str,
    collection: str,
) -> DataStreamReader:
    """CDC change-stream source (reference S8,
    ``src/process_insert_update_weather_data.py:168-170``) — feeds the
    same foreachBatch merge as the file-based CDC source in
    ``streaming.cdc_merge``; publish-full-document so update events
    carry the post-image."""
    return (
        spark.readStream.format("mongodb")
        .option("spark.mongodb.read.connection.uri", connection_uri)
        .option("spark.mongodb.read.database", database)
        .option("spark.mongodb.read.collection", collection)
        .option("spark.mongodb.change.stream.publish.full.document.only", "true")
    )


def bigquery_table_reader(spark: SparkSession, table: str, dataset: str | None = None):
    """BigQuery scan (reference S9) via the Storage Read API."""
    r = spark.read.format("bigquery").option("table", table)
    if dataset:
        r = r.option("dataset", dataset)
    return r


def bigquery_append(df: DataFrame, table: str, temp_bucket: str | None = None) -> None:
    """Typed append to BigQuery (replaces the reference's generated
    INSERT DML, K2/K3). Raises ConnectorUnavailable if the connector
    jar is absent."""
    w = df.write.format("bigquery").mode("append").option("table", table)
    if temp_bucket:
        w = w.option("temporaryGcsBucket", temp_bucket)
    try:
        w.save()
    except Exception as e:  # connector jar / service absent
        raise ConnectorUnavailable(
            f"bigquery connector unavailable in this environment: {e}"
        ) from e
