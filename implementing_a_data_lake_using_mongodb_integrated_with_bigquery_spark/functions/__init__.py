from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.functions.cleaning import (
    parse_minute_timestamp,
    strip_direction_suffix,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "parse_minute_timestamp",
    "strip_direction_suffix",
]
