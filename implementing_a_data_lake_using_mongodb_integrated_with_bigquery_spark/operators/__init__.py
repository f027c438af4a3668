from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup import (
    dedup_against_target,
    duplicate_audit,
    exact_dedup,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.flatten import (
    flatten_weather,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.integrity import (
    fk_filter,
    fk_violations,
    new_rows_only,
    reconcile_counts,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.merge import (
    last_write_wins,
    upsert,
)

__all__ = [
    "dedup_against_target",
    "duplicate_audit",
    "exact_dedup",
    "fk_filter",
    "fk_violations",
    "flatten_weather",
    "last_write_wins",
    "new_rows_only",
    "reconcile_counts",
    "upsert",
]
