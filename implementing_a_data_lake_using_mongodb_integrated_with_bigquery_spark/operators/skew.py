"""Skew-resistant join: key salting.

AQE's skew-join splitting handles most hot keys at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in our session), but
salting is the deterministic-plan fallback when a handful of keys
dominate (a viral user_id, a null-heavy FK): the fact side scatters
each hot key across ``salt_buckets`` sub-keys, the dim side replicates
each row ``salt_buckets`` times, and the join key becomes
(key, salt) — hot partitions shrink by the bucket factor at the cost
of |dim|·buckets replication. Results are identical to the unsalted
join for any 1:N equi-join (each fact row still meets exactly its
matching dim rows, once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on ``on`` with the fact side salted.

    ``dim`` must be unique per key (1:N join) — each dim row is
    replicated per salt bucket, so a many:many join would duplicate.
    """
    fact_s = fact.withColumn(
        "_salt", (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))).cast("int")
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return fact_s.join(dim_s, on=[on, "_salt"], how=how).drop("_salt")
