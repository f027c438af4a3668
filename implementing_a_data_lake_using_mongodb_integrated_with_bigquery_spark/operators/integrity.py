"""Key-integrity operators: PK idempotence, FK validation, reconciliation.

The reference enforces integrity procedurally, one RPC per record:

- PK existence check (skip insert if id already present):
  ``src/process_insert_update_weather_data.py:49-62`` — one
  ``SELECT 1 ... WHERE id=...`` per event.
- FK check (drop fact row whose place_id is absent from the dim):
  ``src/process_insert_update_weather_data.py:66-79``.
- Count reconciliation (lake rows == warehouse rows):
  ``README.md:140``.

Here every check is a *set-oriented join over the whole batch*:
one broadcast/shuffle join replaces N network round-trips. The key-set
side carries NO broadcast hint (r11 audit fix): the referenced key set
is data-proportional in general (an orders key set, a warehouse PK
set), and a hint is obeyed at ANY size — at 100 TB it would OOM the
executors. Catalyst/AQE auto-broadcast the key set whenever its
runtime size is actually under the threshold (identical plan at every
tested SF) and fall back to a shuffled semi/anti join when it isn't —
exactly the adaptive behavior a hint forfeits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def new_rows_only(batch: DataFrame, target: DataFrame, key: str | list[str]) -> DataFrame:
    """Rows of ``batch`` whose key is NOT already in ``target``.

    Set-oriented form of the reference's per-row existence probe
    (``check_row_existence``,
    ``src/process_insert_update_weather_data.py:49-62``): appending the
    result is an idempotent, effectively-once insert.
    """
    keys = [key] if isinstance(key, str) else list(key)
    return batch.join(target.select(*keys), on=keys, how="left_anti")


def fk_filter(fact: DataFrame, dim: DataFrame, fk: str | list[str]) -> DataFrame:
    """Keep fact rows whose FK exists in ``dim`` (referential integrity).

    Set-oriented form of ``check_foreign_key``
    (``src/process_insert_update_weather_data.py:66-79``). No broadcast
    hint: the planner broadcasts the key set when it is genuinely small
    (a left-semi broadcast hash join never shuffles the fact) and
    shuffles both sides when it isn't — a hint here is an executor OOM
    once the referenced table grows with the data (r11 audit).
    """
    keys = [fk] if isinstance(fk, str) else list(fk)
    return fact.join(dim.select(*keys), on=keys, how="left_semi")


def fk_violations(fact: DataFrame, dim: DataFrame, fk: str | list[str]) -> DataFrame:
    """Fact rows REJECTED by the FK check — the reference logs these
    (``src/process_insert_update_weather_data.py:75-79``); we route them
    to a dead-letter sink instead of dropping them silently."""
    keys = [fk] if isinstance(fk, str) else list(fk)
    return fact.join(dim.select(*keys), on=keys, how="left_anti")


def reconcile_counts(source: DataFrame, target: DataFrame, key: str) -> DataFrame:
    """Lake/warehouse parity audit (``README.md:140``): row counts,
    distinct-key counts, and key-set differences in both directions —
    ONE plan (per-side key aggregation + full outer join + final agg),
    no driver-side sub-jobs. Returns a 1-row DataFrame."""
    s = (
        source.select(F.col(key).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("s_cnt"))
    )
    t = (
        target.select(F.col(key).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("t_cnt"))
    )
    fo = s.join(t, "k", "full_outer")
    agg = fo.agg(
        F.coalesce(F.sum("s_cnt"), F.lit(0)).cast("long").alias("source_rows"),
        F.count("s_cnt").cast("long").alias("source_keys"),
        F.coalesce(F.sum("t_cnt"), F.lit(0)).cast("long").alias("target_rows"),
        F.count("t_cnt").cast("long").alias("target_keys"),
        F.count(F.when(F.col("t_cnt").isNull(), 1)).cast("long").alias("missing_in_target"),
        F.count(F.when(F.col("s_cnt").isNull(), 1)).cast("long").alias("extra_in_target"),
    )
    return agg.withColumn(
        "consistent",
        (F.col("missing_in_target") == 0) & (F.col("extra_in_target") == 0),
    )

def content_checksum(
    df: DataFrame, cols: list[str], group_by: str | None = None
) -> DataFrame:
    """Order-independent content checksum — anti-entropy reconciliation
    without moving data.

    Generalizes the reference's count-only parity audit (``README.md:140``)
    to CONTENT parity: each row is canonicalized to a string
    (caller pre-casts floats/timestamps to deterministic forms), md5'd,
    and the first 8 hex digits are summed as integers. Integer addition
    is associative/commutative, so the checksum is identical under any
    partitioning and row order — two stores agree iff (with md5-collision
    probability) they hold the same multiset of rows. Map-only + a
    |groups|-row aggregate: at 100 TB each side computes its checksum
    in place and only the tiny digest crosses the wire.
    """
    row_str = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    h = F.conv(F.substring(F.md5(row_str), 1, 8), 16, 10).cast("long")
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h).alias("checksum"),
        F.min(h).alias("min_digest"),
        F.max(h).alias("max_digest"),
    ]
    if group_by is None:
        return df.agg(*aggs)
    return df.groupBy(group_by).agg(*aggs)
