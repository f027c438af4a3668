"""Event-time token-bucket rate limiting (SURVEY §2.7 T6, deepened).

The reference throttles its API loop with wall-clock sleeps
(``src/ingest_weather_data.py:118-127``) — a driver-side,
non-replayable policy. The lake-side equivalent is an EVENT-TIME
token bucket: each key owns a bucket that refills with event time and
each event spends one token or is flagged throttled. Because the
recurrence depends only on event timestamps (never on processing
time), the decision sequence is deterministic and replayable — the
same property that makes it oracle-checkable in SQL (a recursive CTE
replays the identical recurrence).

Exactness: the bucket state is INTEGER micro-tokens; the refill is
``delta_us // refill_us_per_token`` (integer division), so Spark and
DuckDB agree bit-for-bit. A float ``rate * delta_seconds`` bucket
could disagree in the last ulp and flip a boundary decision.

Scale shape: one shuffle on the key; each group replays its own
sequence inside ``applyInPandas`` (the recurrence is inherently
sequential PER KEY — min/clip prevents a prefix-sum formulation — but
keys parallelize freely, which is the dimension that grows at 100 TB).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.functions.cleaning import (
    epoch_us,
)

_TOKEN_U = 1_000_000  # one token, in micro-tokens


def token_bucket_flags(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    capacity_tokens: int = 3,
    refill_us_per_token: int = 3_600_000_000,
) -> DataFrame:
    """One row per event with its admission decision.

    Bucket starts full (``capacity_tokens``); each admitted event costs
    one token; the bucket refills one token per ``refill_us_per_token``
    event-time microseconds (default: 1 token/hour), capped at
    capacity. Events order by (event time, id) — a total order, so the
    replay is unique."""
    cap_u = capacity_tokens * _TOKEN_U
    if refill_us_per_token % _TOKEN_U:
        raise ValueError("refill_us_per_token must be a whole-second multiple")
    # µs of event time per MICRO-token: dividing delta_us by this small
    # divisor keeps the arithmetic inside BIGINT on both engines
    # (delta_us * 1e6 would overflow int64 for month-scale gaps)
    us_per_microtoken = refill_us_per_token // _TOKEN_U

    # One JVM-side repartition+sort, then ONE sequential scan per
    # partition via mapInPandas with a per-key state dict carried
    # across Arrow batches. Deliberately NOT groupBy().applyInPandas:
    # that materializes one pandas frame per key, and at thousands of
    # keys per task the per-group construction overhead dwarfs the
    # O(rows) replay loop (measured ~4s → ~0.5s at sf0.1). Each
    # partition holds complete keys in (key, ts, id) order, so a key's
    # rows can span Arrow batches but never partitions.
    def scan(batches):
        import numpy as np

        state: dict = {}  # key → (tokens, last_ts)
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            ts = pdf["_ts_us"].to_numpy(dtype=np.int64)
            allowed = np.empty(len(ts), dtype=bool)
            for i in range(len(ts)):
                k = keys[i]
                tokens, prev = state.get(k, (cap_u, None))
                if prev is not None:
                    tokens = min(
                        cap_u, tokens + (int(ts[i]) - prev) // us_per_microtoken
                    )
                if tokens >= _TOKEN_U:
                    tokens -= _TOKEN_U
                    allowed[i] = True
                else:
                    allowed[i] = False
                state[k] = (tokens, int(ts[i]))
            out = pdf[[key_col, id_col]].copy()
            out["allowed"] = allowed
            yield out

    tagged = df.select(
        key_col, id_col, epoch_us(F.col(ts_col)).alias("_ts_us")
    )
    key_t = df.schema[key_col].dataType.simpleString()
    id_t = df.schema[id_col].dataType.simpleString()
    ordered = tagged.repartition(F.col(key_col)).sortWithinPartitions(
        key_col, "_ts_us", id_col
    )
    return ordered.mapInPandas(
        scan, f"{key_col} {key_t}, {id_col} {id_t}, allowed boolean"
    )
