"""Round-7 operator unit tests: interval-overlap join (vs the naive
quadratic formulation), skyline dominance (vs brute force), EWMA
integer exactness, histogram selectivity bounds, bigram familiarity,
and the gaps-and-islands streak shape."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F


def test_interval_overlap_join_matches_bruteforce(spark):
    """Bin-blocked overlap join == per-key all-pairs check, including
    pairs that span multiple bins and touching (non-overlapping)
    intervals, for every bin width."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    rows = [
        # key, id, start, end
        (1, 1, 0, 10),
        (1, 2, 5, 15),      # overlaps 1
        (1, 3, 10, 20),     # touches 1 (no overlap, strict), overlaps 2
        (1, 4, 100, 230),   # spans multiple bins alone
        (1, 5, 150, 400),   # overlaps 4 across a bin boundary
        (2, 6, 0, 10),      # other key: never pairs with key 1
        (2, 7, 3, 4),       # nested inside 6
        (3, 8, 7, 7),       # zero-length: overlaps nothing
        (3, 9, 5, 9),
    ]
    df = spark.createDataFrame(rows, "k long, id long, s long, e long")

    expected = set()
    for (k1, i1, s1, e1), (k2, i2, s2, e2) in itertools.combinations(rows, 2):
        if k1 == k2 and s1 < e2 and s2 < e1:
            a, b = min(i1, i2), max(i1, i2)
            expected.add((k1, a, b, min(e1, e2) - max(s1, s2)))

    for width in (1, 7, 64, 1000):
        got = {
            (r["k"], r["a_id"], r["b_id"], r["overlap"])
            for r in interval_overlap_join(df, "k", "id", "s", "e", width).collect()
        }
        assert got == expected, f"bin_width={width}"


def test_skyline_2d_matches_bruteforce(spark):
    """Window-lowered skyline == quadratic dominance filter, with
    duplicate points and same-x / same-y ties."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.skyline import (
        skyline_2d,
    )

    pts = [
        (1, 9, 100),
        (1, 9, 101),   # duplicate point: survives together
        (2, 9, 102),   # dominated by (1,9) (same y, larger x)
        (1, 12, 103),  # dominated within x-group by (1,9)
        (3, 5, 104),
        (3, 5, 105),
        (4, 5, 106),   # dominated by (3,5)
        (5, 2, 107),
        (9, 1, 108),
        (9, 4, 109),   # dominated by (5,2)
    ]
    df = spark.createDataFrame(pts, "x long, y long, id long")

    def dominated(p, q):
        return q[0] <= p[0] and q[1] <= p[1] and (q[0] < p[0] or q[1] < p[1])

    sky = {
        (x, y)
        for x, y, _ in pts
        if not any(dominated((x, y), (qx, qy)) for qx, qy, _ in pts)
    }
    got = {(r["x"], r["y"]): (r["n_rows"], r["min_id"]) for r in skyline_2d(
        df, "x", "y", "id").collect()}
    assert set(got) == sky
    assert got[(1, 9)] == (2, 100)
    assert got[(3, 5)] == (2, 104)


def test_ewma_flags_integer_exact(spark):
    """Hand-computed power-of-two weighted sum with span=2: ewma and
    the spike flag come out of pure BIGINT arithmetic."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.timeseries import (
        ewma_flags,
    )

    rows = [("a", t, n) for t, n in enumerate([4, 8, 2, 100, 1])]
    df = spark.createDataFrame(rows, "k string, t long, n long")
    out = {r["t"]: r for r in ewma_flags(df, "k", "t", "n", span=2,
                                         spike_factor=3).collect()}
    # span=2 -> weights (2, 1) on lags (1, 2), norm = 3
    # t=2: ws = 8*2 + 4*1 = 20, ewma = 20/3; 2*3 <= 3*20 -> no spike
    # t=3: ws = 2*2 + 8*1 = 12, ewma = 4.0; 100*3 > 3*12 -> spike
    # t=4: ws = 100*2 + 2*1 = 202
    assert set(out) == {2, 3, 4}
    assert out[2]["ewma"] == round(20 / 3, 6) and not out[2]["is_spike"]
    assert out[3]["ewma"] == 4.0 and out[3]["is_spike"]
    assert out[4]["ewma"] == round(202 / 3, 6) and not out[4]["is_spike"]


def test_selectivity_audit_exact_on_uniform(spark):
    """On 1..3200 (uniform, 32 buckets of 100), the equi-depth
    interpolation is near-exact for every threshold and the audit's
    true counts are exact."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.histogram import (
        selectivity_audit,
    )

    df = spark.range(1, 3201).select(
        F.col("id").alias("v"), F.col("id").alias("tb")
    )
    out = {r["threshold"]: r for r in selectivity_audit(
        df, "v", "tb", [150, 1600, 3150], n_buckets=32).collect()}
    for x in (150, 1600, 3150):
        assert out[x]["true_rows"] == 3200 - x
        # uniform data: interpolation error bounded by one bucket's
        # boundary-gap handling (hi_b < lo_{b+1} gaps are unmodeled)
        assert abs(out[x]["est_rows"] - out[x]["true_rows"]) <= 2.0
        assert abs(out[x]["rel_error"]) <= 0.05


def test_bigram_familiarity_hand_example(spark):
    """Two docs sharing a bigram: familiarity = occurrence-weighted
    mean corpus bigram count; single-token doc dropped."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.collocations import (
        bigram_familiarity,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b x"), (3, "zzz")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_familiarity(docs).collect()}
    # corpus bigrams: (a,b) x2, (b,c) x1, (b,x) x1
    # doc 1: bigrams (a,b),(b,c) -> (2 + 1)/2 = 1.5
    # doc 2: bigrams (a,b),(b,x) -> (2 + 1)/2 = 1.5
    assert set(out) == {1, 2}
    assert out[1]["n_bigrams"] == 2 and out[1]["familiarity"] == 1.5
    assert out[2]["n_bigrams"] == 2 and out[2]["familiarity"] == 1.5


def test_order_streaks_islands(spark):
    """Registry streak query finds the hand-built consecutive-month
    runs (threshold lowered via direct island arithmetic on a toy
    frame run through the same shape)."""
    from pyspark.sql import Window

    months = spark.createDataFrame(
        [(1, m) for m in (0, 1, 2, 5, 6)] + [(2, m) for m in (3, 7)],
        "c long, m long",
    )
    w = Window.partitionBy("c").orderBy("m")
    runs = (
        months.withColumn("g", F.col("m") - F.row_number().over(w))
        .groupBy("c", "g")
        .agg(F.count(F.lit(1)).alias("len"))
        .groupBy("c")
        .agg(F.max("len").alias("longest"), F.count(F.lit(1)).alias("n_runs"))
    )
    got = {r["c"]: (r["longest"], r["n_runs"]) for r in runs.collect()}
    assert got == {1: (3, 2), 2: (1, 2)}


def test_kcore_peel_hand_graph(spark):
    """4-clique + pendant chain, k=3: the clique survives (degree 3
    each), the chain peels away; a node whose degree drops only after
    round 1 peels in round 2 (cascade pinned)."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.graph import (
        kcore_peel,
    )

    clique = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    # 5 hangs off the clique with 3 neighbors but one is the pendant 6:
    # after 6 peels (deg 1), 5 drops to deg 2 and peels next round
    extra = [(1, 5), (2, 5), (5, 6)]
    df = spark.createDataFrame(clique + extra, "s long, d long")
    out = {r["node"]: r["core_degree"] for r in kcore_peel(
        df, "s", "d", k=3, rounds=3).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    # with a single round, 5 is still alive (deg 3 incl. the pendant
    # edge at peel time -> edges to 1,2 survive round 0... verify the
    # bounded-rounds semantics differs from the fixpoint
    one = {r["node"]: r["core_degree"] for r in kcore_peel(
        df, "s", "d", k=3, rounds=1).collect()}
    assert 5 in one and one[1] == 4  # edge (1,5) not yet peeled


def test_merkle_bucket_summary_detects_one_changed_row(spark):
    """Identical tables -> identical summaries; flipping one row's
    payload flips exactly that key's bucket checksum, counts equal."""
    from pyspark.sql import functions as F
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.diff import (
        merkle_bucket_summary,
    )

    rows = [(i, f"seg{i % 3}", i * 100) for i in range(1, 201)]
    a = spark.createDataFrame(rows, "k long, seg string, cents long")
    b = spark.createDataFrame(
        [(k, s, c + 1 if k == 77 else c) for k, s, c in rows],
        "k long, seg string, cents long",
    )
    payload = F.concat_ws("|", F.col("seg"), F.col("cents").cast("string"))
    sa = {r["bucket"]: (r["n_rows"], r["checksum"]) for r in
          merkle_bucket_summary(a, "k", payload, 16).collect()}
    sb = {r["bucket"]: (r["n_rows"], r["checksum"]) for r in
          merkle_bucket_summary(b, "k", payload, 16).collect()}
    diverged = [bk for bk in sa if sa[bk] != sb[bk]]
    assert diverged == [77 % 16]
    assert sa[77 % 16][0] == sb[77 % 16][0]  # counts equal, checksum differs


def test_skew_report_metrics(spark):
    """Uniform keys -> gini 0; one hot key -> hot_key_rows surfaces it
    and top_key_share is exact."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.skew import (
        skew_report,
    )

    uniform = spark.createDataFrame(
        [(k,) for k in range(10) for _ in range(5)], "k long"
    )
    m = {(r["metric"], r["key"]): r["value"] for r in skew_report(
        uniform, "k", top_n=2).collect()}
    assert m[("gini", None)] == 0.0
    assert m[("top_key_share", None)] == 0.1
    assert m[("n_keys", None)] == 10.0

    skewed = spark.createDataFrame(
        [(1,)] * 90 + [(k,) for k in range(2, 12)], "k long"
    )
    m2 = {(r["metric"], r["key"]): r["value"] for r in skew_report(
        skewed, "k", top_n=1).collect()}
    assert m2[("hot_key_rows", 1)] == 90.0
    assert m2[("top_key_share", None)] == 0.9


def test_prorate_largest_remainder_exact_sum(spark):
    """Shares are integers, sum exactly to the group total, and the
    leftover cents go to the largest remainders (id tiebreak)."""
    from pyspark.sql import functions as F
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.allocation import (
        prorate_largest_remainder,
    )

    # T=100 over weights 1,1,1 -> 33/33/34 with the +1 on the largest
    # remainder; remainders all equal (100*1 % 3 = 1) -> tiebreak id asc
    rows = [(1, 1, 100, 1), (1, 1, 100, 2), (1, 1, 100, 3),
            # T=7 over weights 5, 3 -> base 4,2; rem 35%8=3, 21%8=5 -> +1 to id 2
            (2, 5, 7, 1), (2, 3, 7, 2)]
    df = spark.createDataFrame(rows, "g long, w long, t long, id long")
    out = {(r["g"], r["id"]): r["alloc"] for r in prorate_largest_remainder(
        df, "g", "w", "t", "id").collect()}
    assert out[(1, 1)] == 34 and out[(1, 2)] == 33 and out[(1, 3)] == 33
    assert out[(2, 1)] == 4 and out[(2, 2)] == 3
    # exact-sum invariant on a larger random-ish group
    big = spark.createDataFrame(
        [(9, (i * 37) % 11 + 1, 12345, i) for i in range(50)],
        "g long, w long, t long, id long",
    )
    total = (prorate_largest_remainder(big, "g", "w", "t", "id")
             .agg(F.sum("alloc").alias("s")).collect()[0]["s"])
    assert total == 12345


def test_grid_nearest_join_matches_neighborhood_bruteforce(spark):
    """Grid-probed argmin == brute-force argmin restricted to the 3x3
    neighborhood; a left point with no candidate in its neighborhood
    is dropped; within-cell_size results equal the GLOBAL nearest."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.spatial import (
        grid_nearest_join,
    )

    lpts = [(1, 10, 10), (2, 95, 95), (3, 900, 900), (4, 500, 10)]
    rpts = [(101, 12, 14), (102, 105, 110), (103, 180, 180), (104, 520, 40)]
    left = spark.createDataFrame(lpts, "lid long, x long, y long")
    right = spark.createDataFrame(rpts, "rid long, x long, y long")
    got = {r["lid"]: (r["rid"], r["dist_sq"]) for r in grid_nearest_join(
        left, right, "lid", "rid", cell_size=100).collect()}

    expected = {}
    for lid, lx, ly in lpts:
        cands = [
            (rid, (lx - rx) ** 2 + (ly - ry) ** 2)
            for rid, rx, ry in rpts
            if abs(lx // 100 - rx // 100) <= 1 and abs(ly // 100 - ry // 100) <= 1
        ]
        if cands:
            d = min(c[1] for c in cands)
            expected[lid] = (min(r for r, dd in cands if dd == d), d)
    assert got == expected
    assert 3 not in got            # isolated point dropped
    assert got[1] == (101, 4 + 16)  # global nearest (d <= cell_size)


def test_modal_imputation_tiebreak(spark):
    """Mode with count tie resolves to the lexicographically smaller
    segment — same argmax discipline both engines replay."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(1, "B"), (1, "B"), (1, "A"), (1, "A"), (2, "Z")]
    df = spark.createDataFrame(rows, "nation long, seg string")
    counts = df.groupBy("nation", "seg").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("nation").orderBy(F.col("n").desc(), F.col("seg").asc())
    modal = {r["nation"]: r["seg"] for r in counts.withColumn(
        "rn", F.row_number().over(w)).where(F.col("rn") == 1).collect()}
    assert modal == {1: "A", 2: "Z"}


def test_evolving_dim_enrich_uses_per_batch_dim(spark):
    """Batch i must be enriched by dim VERSION i: with a dim that
    flips labels per batch, the two phases of identical rows produce
    different tiers — proving the static side is re-evaluated per
    trigger, not captured at start."""
    from pyspark.sql import functions as F
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.enrich_stream import (
        evolving_dim_enrich_phased,
    )

    p = spark.createDataFrame([(1, 10), (2, 20)], "user_id long, cents long")

    def dim_builder(sp, batch_id):
        return sp.createDataFrame(
            [(1, f"v{batch_id}-a"), (2, f"v{batch_id}-b")],
            "user_id long, tier string",
        )

    out, stats = evolving_dim_enrich_phased(
        spark,
        [p, p],
        dim_builder,
        "user_id",
        lambda: [F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("cents").cast("long").alias("s")],
        ["tier"],
    )
    rows = {(r["batch_id"], r["tier"]): (r["n"], r["s"]) for r in out.collect()}
    assert stats["data_batches"] == 2
    assert rows == {
        (0, "v0-a"): (1, 10), (0, "v0-b"): (1, 20),
        (1, "v1-a"): (1, 10), (1, "v1-b"): (1, 20),
    }


def _physical_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_interval_overlap_join_plan_has_no_nested_loop(spark):
    """The bin-blocked lowering must plan as a hash/sort-merge
    EQUI-join — a BroadcastNestedLoopJoin or CartesianProduct means
    the non-equi predicate leaked into the join condition and the
    operator is quadratic again."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    df = spark.range(100).selectExpr(
        "id % 7 AS k", "id AS iid", "id * 10 AS s", "id * 10 + 25 AS e"
    )
    plan = _physical_plan(interval_overlap_join(df, "k", "iid", "s", "e", 64))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_grid_nearest_join_plan_has_no_nested_loop(spark):
    """Same guarantee for the spatial lowering: the 3x3 probe must be
    a cell equi-join, never a nested-loop distance join."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.spatial import (
        grid_nearest_join,
    )

    left = spark.range(50).selectExpr("id AS lid", "id * 13 % 997 AS x", "id * 29 % 997 AS y")
    right = spark.range(50).selectExpr("id AS rid", "id * 17 % 997 AS x", "id * 31 % 997 AS y")
    plan = _physical_plan(grid_nearest_join(left, right, "lid", "rid", cell_size=100))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
