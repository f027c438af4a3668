"""Deterministic content-addressed sampling / dataset splitting.

Training pipelines need train/val/test assignment that is (a) stable
across reruns and cluster layouts, (b) portable across engines, and
(c) a pure function of the ROW, not of partition order — ``df.sample``
/ ``sampleBy`` are seeded per-partition and reshuffle-sensitive, so
they fail (a) and (c). The standard fix is hash bucketing: a row's
split is decided by a cryptographic hash of its key, compared against
fraction boundaries.

Implementation detail that makes it engine-portable: the comparison is
done LEXICOGRAPHICALLY on the first 8 hex chars of ``md5(salt||key)``
against precomputed hex boundaries — md5 produces identical lowercase
hex everywhere, so the exact same rows land in the exact same split on
Spark, DuckDB, or a shell pipeline. No integer parsing of hex needed
(Spark's ``conv`` and DuckDB's hex parsing disagree on overflow).

Map-only: no shuffle, no driver state; scales linearly with input
splits. Changing ``salt`` re-rolls every assignment (new experiment);
keeping it fixed makes splits append-stable as the corpus grows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPACE = 16 ** 8  # first 8 hex chars of the digest


def split_boundaries(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """(split_name, upper-bound-hex) pairs, cumulative; the last split
    absorbs rounding remainder."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    for name, frac in fractions.items():
        acc += frac
        out.append((name, format(min(int(acc * _SPACE), _SPACE - 1), "08x")))
    return out


def split_column(key: Column, fractions: dict[str, float], salt: str = "v1") -> Column:
    """The split label as a pure column expression."""
    h = F.substring(F.md5(F.concat(F.lit(salt), F.lit("\x1f"), key.cast("string"))), 1, 8)
    bounds = split_boundaries(fractions)
    expr = F.when(h <= F.lit(bounds[0][1]), F.lit(bounds[0][0]))
    for name, ub in bounds[1:]:
        expr = expr.when(h <= F.lit(ub), F.lit(name))
    return expr


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "v1",
    split_col: str = "split",
) -> DataFrame:
    """Tag every row with its deterministic split assignment."""
    return df.withColumn(split_col, split_column(F.col(key_col), fractions, salt))


def split_sql_case(key_sql: str, fractions: dict[str, float], salt: str = "v1") -> str:
    """The DuckDB-compatible CASE expression for the SAME assignment —
    generated from the same boundaries so engine and oracle can't
    drift."""
    h = f"substr(md5('{salt}' || chr(31) || CAST({key_sql} AS VARCHAR)), 1, 8)"
    bounds = split_boundaries(fractions)
    branches = " ".join(f"WHEN {h} <= '{ub}' THEN '{name}'" for name, ub in bounds)
    return f"CASE {branches} END"


def stratified_cap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    salt: str = "v1",
) -> DataFrame:
    """At most ``cap`` rows per group, chosen DETERMINISTICALLY: rows
    rank within their group by ``md5(salt, key)`` (hash order = an
    unbiased but reproducible shuffle), ties broken by the key itself.
    The balanced-corpus primitive (cap documents per source/language
    so one crawl domain can't dominate training data) — one shuffle on
    the group key, same engine-portability argument as
    ``split_column``."""
    from pyspark.sql import Window

    h = F.md5(
        F.concat(F.lit(salt), F.lit("\x1f"), F.col(key_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= cap)
        .drop("_rank")
    )


def mixture_weights(
    df: DataFrame,
    group_cols: list[str],
    size_col: Column | str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group sampling weights for a training-data mixture,
    proportional to ``sqrt(total size)`` — the standard sub-linear
    reweighting that keeps head domains/languages from drowning the
    tail (temperature sampling with T=2 over corpus sizes).

    Determinism: the sqrt weight is scaled+rounded to a BIGINT before
    the total, so both the numerator and the normalizing sum are exact
    integer arithmetic — identical under any partitioning and on any
    engine (IEEE 754 requires correctly-rounded sqrt). ``weight`` is
    the 6dp-rounded share.

    Scale shape: one full aggregation (map-side combined) down to the
    group cardinality, then an unpartitioned window over the GROUP
    table for the total. A mixture table is small by definition
    (domains × languages, thousands at most), so the single-task
    window is on reduced data, never on the corpus.
    """
    from pyspark.sql import Window

    size = F.col(size_col) if isinstance(size_col, str) else size_col
    g = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(size.cast("long")).alias("n_tokens"),
    )
    g = g.withColumn(
        "w_scaled", F.round(F.sqrt(F.col("n_tokens")) * scale).cast("long")
    )
    total = F.sum("w_scaled").over(Window.partitionBy())
    return g.withColumn("weight", F.round(F.col("w_scaled") / total, 6))


def apportion_budget(
    weights: DataFrame,
    group_cols: list[str],
    weight_col: str = "w_scaled",
    budget: int = 1_000_000,
) -> DataFrame:
    """Integer token-budget apportionment (Hamilton / largest
    remainder): split a fixed training-token budget across mixture
    groups exactly proportionally to their integer weights, with
    ``sum(alloc) == budget`` guaranteed.

    floor allocations first (``w·B // total``), then the leftover
    tokens go one each to the groups with the largest integer
    remainder (``w·B % total``), ties broken by group name — all
    BIGINT arithmetic, so the result is partition-order-independent
    and engine-exact. Runs entirely on the (tiny) group table: the
    windows are over |groups| rows, never the corpus.
    """
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    total = F.sum(weight_col).over(w_all)
    g = (
        weights.select(
            *group_cols,
            F.col(weight_col).alias("_w"),
            (F.col(weight_col) * budget).alias("_wb"),
            total.alias("_tot"),
        )
        # integer DIV/%, never float division: a double quotient near an
        # integer can floor one off and break sum(alloc) == budget
        .withColumn("_floor", F.expr("_wb DIV _tot"))
        .withColumn("_rem", F.expr("_wb % _tot"))
    )
    leftover = F.lit(budget) - F.sum("_floor").over(w_all)
    rank = F.row_number().over(
        Window.orderBy(F.col("_rem").desc(), *[F.col(c).asc() for c in group_cols])
    )
    return g.select(
        *group_cols,
        F.col("_w").alias(weight_col),
        (
            F.col("_floor")
            + F.when(rank <= leftover, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("alloc_tokens"),
    )


def temporal_leakage_audit(
    df: DataFrame,
    ts_col: str,
    entity_col: str,
    cutoff: str,
) -> DataFrame:
    """Time-based train/test split report with an entity-leakage
    count: rows before ``cutoff`` are train, the rest test; an entity
    appearing on BOTH sides leaks future information into training
    (the classic temporal-CV mistake). Output: one row per split with
    event/entity counts plus the shared leak count.

    Scale shape: ONE pass — the fact table shuffles once on the
    entity key into per-entity train/test counts (map-side combined),
    and every output number (per-split events/entities AND the leak
    count) folds out of that single entity table in one 1-row
    aggregate; the two report rows are exploded from it map-only.
    Conditional aggregation instead of a second grouping keeps the
    fact scan single and the plan to two shuffles total.
    """
    # cast the cutoff to the event column's OWN type: an NTZ event
    # column compared against a 'timestamp' literal would coerce
    # NTZ->LTZ through the session timezone, shifting the boundary
    # across DST transitions; matching the type keeps the comparison
    # naive, exactly like the oracle's
    is_train = F.col(ts_col) < F.lit(cutoff).cast(df.schema[ts_col].dataType)
    per_ent = df.groupBy(F.col(entity_col).alias("_ent")).agg(
        F.count_if(is_train).cast("long").alias("_n_train"),
        F.count_if(~is_train).cast("long").alias("_n_test"),
    )
    summary = per_ent.agg(
        F.sum("_n_train").cast("long").alias("_ev_train"),
        F.sum("_n_test").cast("long").alias("_ev_test"),
        F.count_if(F.col("_n_train") > 0).cast("long").alias("_ent_train"),
        F.count_if(F.col("_n_test") > 0).cast("long").alias("_ent_test"),
        F.count_if((F.col("_n_train") > 0) & (F.col("_n_test") > 0))
        .cast("long")
        .alias("n_leaked_entities"),
    )
    return summary.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("train").alias("split"),
                    F.col("_ev_train").alias("n_events"),
                    F.col("_ent_train").alias("n_entities"),
                ),
                F.struct(
                    F.lit("test").alias("split"),
                    F.col("_ev_test").alias("n_events"),
                    F.col("_ent_test").alias("n_entities"),
                ),
            )
        ).alias("_row"),
        F.col("n_leaked_entities"),
    ).select("_row.*", "n_leaked_entities")


def resampling_plan(
    df: DataFrame,
    group_col: str,
    size_col: Column | str,
) -> DataFrame:
    """Downsample-only resampling plan that moves the corpus toward
    the sqrt-size target mixture (the APPLY step to
    ``mixture_weights``): per group, target share ∝ √size, sampling
    factor ∝ target/actual, normalized so the most under-represented
    group keeps everything (accept=1) and every other group is
    down-sampled — no group is ever up-sampled.

    Determinism: sizes aggregate to exact BIGINTs; √ is IEEE
    correctly-rounded and scaled to an integer weight; the accept
    ratio divides two floats each computed from exact integers by the
    same expression on both engines, then rounds to 6dp. One hash
    aggregate to |groups| rows + a 1-row broadcast maximum.
    """
    s = F.col(size_col) if isinstance(size_col, str) else size_col
    g = df.groupBy(group_col).agg(F.sum(s.cast("long")).alias("n_tokens"))
    g = g.withColumn(
        "_w", F.round(F.sqrt(F.col("n_tokens").cast("double")) * 1_000_000).cast("long")
    )
    ratio = F.col("_w").cast("double") / F.col("n_tokens")
    mx = g.agg(F.max(ratio).alias("_max_ratio"))
    out = g.crossJoin(F.broadcast(mx)).select(
        group_col,
        "n_tokens",
        F.round(ratio / F.col("_max_ratio"), 6).alias("accept_prob"),
    )
    return out.withColumn(
        "expected_tokens",
        F.floor(F.col("n_tokens") * F.col("accept_prob")).cast("long"),
    )


def resampling_execute(
    df: DataFrame,
    plan: DataFrame,
    group_col: str,
    key_col: str,
    salt: str = "rs1",
) -> DataFrame:
    """APPLY a :func:`resampling_plan`: accept each row iff the 16-bit
    value of its salted md5 falls under ``floor(accept_prob · 65536)``
    — the same engine-portable bits the shard writer uses, so the
    realized sample is a pure function of row content (reproducible
    across reruns, engines, and cluster layouts; achieved rate within
    1/65536 of the plan). The plan is |groups| rows → broadcast join;
    the hash filter is map-only."""
    from pyspark.sql import functions as F

    h16 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt), F.lit("\x1f"), F.col(key_col).cast("string")
                )
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    thr = F.floor(F.col("accept_prob") * 65536.0).cast("long")
    return df.join(
        F.broadcast(plan.select(group_col, "accept_prob")), group_col
    ).filter(h16 < thr)


def unimax_allocation(
    df: DataFrame,
    group_cols: list[str],
    size_col: Column | str,
    budget: int | None = None,
    epoch_cap: int = 4,
    budget_pct_of_capacity: int | None = None,
) -> DataFrame:
    """UniMax budget-capped mixture allocation (Chung et al. 2023,
    "UniMax: Fairer and More Effective Language Sampling for
    Large-Scale Multilingual Pretraining"): split a fixed training
    token budget across groups as UNIFORMLY as possible, subject to no
    group being repeated more than ``epoch_cap`` epochs — the
    waterfilling complement of the proportional
    :func:`apportion_budget` (Hamilton) and the sqrt-temperature
    :func:`mixture_weights`. Small groups are capped at
    ``epoch_cap · n_tokens``; the residual budget spreads equally over
    the rest. Pass either an absolute ``budget`` (tokens) or
    ``budget_pct_of_capacity`` (the budget as an integer percentage of
    total capacity, computed on the group table itself — the
    distribution-relative form that cannot go stale as the corpus
    grows; ``Σcapacity · pct`` ≤ ~1e16 at 100 TB, LONG-safe).

    Closed-form waterfill over the ascending-capacity order (all
    BIGINT): a group at ascending position j (of m) is CAPPED iff
    ``c_j · (m − j + 1) ≤ budget − Σ_{i<j} c_i`` — capacities are
    ascending, so the capped set is provably a prefix and the per-row
    flag is self-consistent. Uncapped groups split the residual
    ``R = budget − Σ_capped c`` as ``R div u`` each, with the
    ``R mod u`` leftover tokens going one each to the first uncapped
    groups in ``group_cols`` order (largest-remainder convention).
    The waterfill inequality guarantees base+1 ≤ every uncapped
    capacity, so no allocation exceeds its cap and
    ``sum(alloc) == budget`` exactly whenever the budget is feasible
    (``budget ≤ Σ c``); an infeasible budget caps every group and the
    shortfall is visible as ``sum(alloc) < budget`` — UniMax's
    epoch-cap contract, not an error.

    Overflow: ``c_j · (m − j + 1)`` ≤ total corpus tokens × |groups| —
    LONG-safe below ~9.2e18/m tokens per group (≈1e15 at m=100, 20×
    the whole-corpus token count of 100 TB of text).

    Returns (group_cols…, n_docs, n_tokens, capacity, capped,
    alloc_tokens, epochs_micro = alloc·10⁶ div n_tokens).

    Scale shape: ONE map-side-combinable aggregation collapses the
    corpus to the |groups| mixture table; every window below runs over
    that tiny table (domain-bounded — languages × sources), never the
    corpus.
    """
    from pyspark.sql import Window

    size = F.col(size_col) if isinstance(size_col, str) else size_col
    g = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(size.cast("long")).alias("n_tokens"),
    ).withColumn(
        "capacity", (F.col("n_tokens") * F.lit(int(epoch_cap))).cast("long")
    )
    if (budget is None) == (budget_pct_of_capacity is None):
        raise ValueError(
            "unimax_allocation: exactly one of budget /"
            " budget_pct_of_capacity"
        )
    asc = [F.col("capacity").asc()] + [F.col(c).asc() for c in group_cols]
    w_all = Window.partitionBy()
    w_ord = Window.orderBy(*asc)
    w_prefix = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    if budget is not None:
        budget_col = F.lit(int(budget)).cast("long")
    else:
        # distribution-relative operating point (the r11/r13 rule):
        # the budget is a fixed share of total CAPACITY, computed on
        # the same tiny group table — no absolute token number to go
        # stale as the corpus grows, and no second corpus scan
        budget_col = F.expr(
            f"(sum(capacity) OVER () * {int(budget_pct_of_capacity)})"
            " div 100"
        )
    g = (
        g.withColumn("_b", budget_col)
        .withColumn("_j", F.row_number().over(w_ord))
        .withColumn("_m", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "_prefix", F.coalesce(F.sum("capacity").over(w_prefix), F.lit(0))
        )
        .withColumn(
            "capped",
            F.col("capacity") * (F.col("_m") - F.col("_j") + 1)
            <= F.col("_b") - F.col("_prefix"),
        )
    )
    u = F.sum(F.when(~F.col("capped"), 1).otherwise(0)).over(w_all)
    r = F.col("_b") - F.coalesce(
        F.sum(F.when(F.col("capped"), F.col("capacity"))).over(w_all),
        F.lit(0),
    )
    # leftover tokens: one each to the first (group_cols-ordered)
    # uncapped groups
    w_unc = Window.partitionBy("capped").orderBy(
        *[F.col(c).asc() for c in group_cols]
    )
    g = (
        g.withColumn("_u", u)
        .withColumn("_r", r)
        .withColumn("_urank", F.row_number().over(w_unc))
    )
    alloc = F.when(F.col("capped"), F.col("capacity")).otherwise(
        F.expr("_r div _u")
        + F.when(F.col("_urank") <= F.expr("_r % _u"), 1).otherwise(0)
    )
    return g.select(
        *group_cols,
        "n_docs",
        "n_tokens",
        "capacity",
        "capped",
        alloc.cast("long").alias("alloc_tokens"),
    ).withColumn(
        # alloc·10⁶ can reach epoch_cap·n_tokens·10⁶ ≈ 1e20 at 100 TB —
        # the r11 ANSI-overflow class: DECIMAL(38,0) internal, BIGINT
        # emitted (the value itself is ≤ epoch_cap·10⁶)
        "epochs_micro",
        F.expr(
            "CAST((CAST(alloc_tokens AS DECIMAL(38,0)) * 1000000)"
            " div n_tokens AS BIGINT)"
        ),
    )
