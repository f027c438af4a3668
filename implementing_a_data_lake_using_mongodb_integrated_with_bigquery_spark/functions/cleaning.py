"""Dirty-data scalar cleaners (reference §2.3 P2/P7/P11).

All pure column expressions — JVM-side, whole-stage-codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_direction_suffix(col: Column | str) -> Column:
    """``"21.0245N"`` → 21.0245 double.

    The reference's places lat/lon are numeric strings with a trailing
    compass letter, cast by slicing (``src/extract_coordinates.py:18``
    ``float(document['lat'][:-1])``); regexp form is suffix-optional so
    clean values pass through.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[NSEWnsew]$", "").cast("double")


def parse_minute_timestamp(col: Column | str) -> Column:
    """Parse "YYYY-MM-DD HH:MM" (no seconds) by appending ":00" —
    the reference's convention (``src/ingest_weather_data.py:64``,
    ``src/process_insert_update_weather_data.py:112``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(F.concat(c, F.lit(":00")), "yyyy-MM-dd HH:mm:ss")


def epoch_us(col: Column | str) -> Column:
    """Timestamp (TZ or NTZ) → epoch microseconds bigint. NTZ values are
    interpreted in the session timezone (pinned UTC), matching DuckDB's
    ``epoch_us`` over naive timestamps."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def compact_timestamp(col: Column | str) -> Column:
    """Timestamp → "yyyyMMddHHmmss" string, the reference's S3 object
    key mangling (``src/ingest_weather_data.py:37``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMddHHmmss")
