from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
    TABLES,
    load_table,
    load_tables,
    parallelize,
)

__all__ = ["TABLES", "load_table", "load_tables", "parallelize"]
