"""PII detection and redaction over text columns.

A training-data pipeline must strip personally identifiable
information before a corpus ships (the reference handles its
equivalent hygiene concern — credential isolation — operationally via
config; see SURVEY.md §3.4). Here detection is a first-class engine
operator: per-document match counts for audit/reporting plus an
in-place masked rewrite.

Engine-portable by construction: every pattern uses the regex subset
with identical semantics in Java's engine (Spark `regexp_count` /
`regexp_replace`) and RE2 (DuckDB) — character classes, bounded
repetition, ``\\b``, ``\\d``; no backreferences or lookaround. The
DuckDB mirror needs the ``'g'`` flag on ``regexp_replace`` (Spark
replaces all occurrences by default, DuckDB only the first).

Both operators are MAP-ONLY column expressions: zero shuffles, fully
pushdown/pruning-transparent, linear in input splits at any scale —
regex evaluation happens JVM-side inside whole-stage codegen, no
Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> (pattern, replacement). REDACTION ORDER IS the dict order:
# email first (longest, contains digit runs), card before phone so a
# 16-digit card is not half-eaten by the shorter phone pattern, ipv4
# before phone (dotted vs dashed, disjoint but cheap to keep ordered).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "card": (r"\b\d{4}-\d{4}-\d{4}-\d{4}\b", "[CARD]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-category match-count columns (``n_email``, ``n_card``, ...),
    each a bigint."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        f"n_{name}": F.regexp_count(c, F.lit(pat)).cast("long")
        for name, (pat, _) in PII_PATTERNS.items()
    }


def redact(text: Column | str) -> Column:
    """Masked copy of ``text`` with every PII match replaced by its
    category token, applied in ``PII_PATTERNS`` order."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, rep in PII_PATTERNS.values():
        c = F.regexp_replace(c, pat, rep)
    return c


def pii_scan(
    df: DataFrame, text_col: str = "text", id_cols: list[str] | None = None
) -> DataFrame:
    """Audit + redaction in one map-only pass: id columns, per-category
    counts, total ``n_pii``, and the ``redacted`` text."""
    ids = id_cols or ["doc_id"]
    counts = pii_counts(text_col)
    total = None
    for col in counts.values():
        total = col if total is None else total + col
    return df.select(
        *ids,
        *[c.alias(n) for n, c in counts.items()],
        total.alias("n_pii"),
        redact(text_col).alias("redacted"),
    )


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Quasi-identifier groups smaller than ``k`` — the re-identification
    risk audit run before releasing training data: any combination of
    quasi-identifiers shared by fewer than k rows singles people out
    and must be suppressed or generalized. One hash aggregate keyed by
    the quasi-identifier tuple (map-side combined); output is the
    violating combos with their group sizes.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("group_size"))
        .filter(F.col("group_size") < k)
    )


def l_diversity_audit(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int
) -> DataFrame:
    """l-diversity: quasi-identifier groups whose SENSITIVE attribute
    takes fewer than ``l`` distinct values — the homogeneity-attack
    complement of :func:`k_anonymity_audit` (a k-large group whose
    members all share one sensitive value still leaks it). One hash
    aggregate keyed by the quasi-identifier tuple; the distinct count
    is exact (count_distinct, not approx — audits must not flake).
    Map-side partials bound the shuffle at |groups × sensitive values|
    per input partition.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("group_size"),
            F.count_distinct(F.col(sensitive_col))
            .cast("long")
            .alias("n_sensitive"),
        )
        .filter(F.col("n_sensitive") < l)
    )


def t_closeness_audit(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, t: float
) -> DataFrame:
    """t-closeness: per quasi-identifier group, the total variation
    distance (the categorical Earth Mover's Distance) between the
    group's sensitive-attribute distribution and the GLOBAL one — the
    skewness-attack complement of :func:`l_diversity_audit` (a group
    can be l-diverse yet still leak because its sensitive mix deviates
    sharply from the table's).

    Exact by construction: tvd_g = Σ_c |n_gc·N − n_c·N_g| / (2·N·N_g)
    is computed over the common denominator, so the summed quantity is
    a BIGINT (integer addition is associative — no float-summation
    order dependence); the single division happens once per group at
    the end, 6dp-rounded. Categories missing from a group contribute
    |0 − n_c·N_g| via the group×category grid (two tiny aggregate
    outputs cross-joined — bounded by |groups|·|categories|, never the
    input). Overflow bound: n_gc·N ≤ N², safe in int64 to ~3·10⁹ rows;
    past that, pre-aggregate to per-group shares scaled by a fixed
    denominator.

    Plan: three hash aggregates over one scan lineage + broadcast
    joins of their (small) outputs. The fact table is never joined to
    itself.
    """
    gc = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_gc")
    )
    g = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).cast("long").alias("n_g"))
    c = df.groupBy(sensitive_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_c")
    )
    total = df.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    grid = g.crossJoin(F.broadcast(c)).crossJoin(F.broadcast(total))
    j = grid.join(F.broadcast(gc), [*quasi_cols, sensitive_col], "left").select(
        *quasi_cols,
        "n_g",
        "n_total",
        (
            F.abs(
                F.coalesce(F.col("n_gc"), F.lit(0)) * F.col("n_total")
                - F.col("n_c") * F.col("n_g")
            )
        ).alias("_num"),
    )
    return (
        j.groupBy(*quasi_cols)
        .agg(
            F.first("n_g").alias("group_size"),
            F.round(
                F.sum("_num") / (2.0 * F.first("n_total") * F.first("n_g")), 6
            ).alias("tvd"),
        )
        .withColumn("violates_t", F.col("tvd") > t)
    )


def generalization_ladder(
    df: DataFrame,
    levels: list[tuple[str, Column]],
    k: int,
) -> DataFrame:
    """The REPAIR step after :func:`k_anonymity_audit`: walk a
    generalization ladder (each level a coarser quasi-identifier —
    hour → day → week …) and report, per level, how many groups exist,
    how many violate k, and whether the level satisfies k-anonymity;
    ``is_chosen`` marks the FIRST satisfying level — the minimal
    generalization that makes the release safe, i.e. the one that
    destroys the least utility.

    One hash aggregate per level over the same scan lineage (the
    levels are a handful — hour/day/week — so this is a few cheap
    passes, each map-side combined), then a single-partition flag pass
    over ≤ |levels| rows.
    """
    from functools import reduce

    from pyspark.sql import Window

    per_level = []
    for i, (name, col) in enumerate(levels):
        g = df.groupBy(col.alias("_q")).agg(
            F.count(F.lit(1)).cast("long").alias("_n")
        )
        per_level.append(
            g.agg(
                F.lit(i).cast("long").alias("_rung"),
                F.lit(name).alias("level"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum((F.col("_n") < k).cast("long"))
                .cast("long")
                .alias("n_violations"),
            )
        )
    ladder = reduce(lambda a, b: a.unionByName(b), per_level).withColumn(
        "satisfies_k", F.col("n_violations") == 0
    )
    # first satisfying rung wins; every finer level is marked not-chosen
    w = Window.orderBy("_rung").rowsBetween(Window.unboundedPreceding, -1)
    prior_ok = F.coalesce(
        F.max(F.col("satisfies_k").cast("long")).over(w), F.lit(0)
    )
    return ladder.withColumn(
        "is_chosen", F.col("satisfies_k") & (prior_ok == 0)
    ).drop("_rung")
