"""Round-10b pins: the model-eval metrics family (exact AUC, PR curve,
kappa, ARI), the zone-map skipping audit, sequential-pattern support,
D'Hondt apportionment, and PPS sampling — semantic invariants the
registry oracles can't express (bounds, symmetry, monotonicity)."""

from __future__ import annotations

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.registry import (
    QUERIES,
)

SF = "/root/testdata/sf0.001"


def test_auc_is_chance_level_for_independent_scorer(spark):
    row = QUERIES["auc_rank_eval"](spark, SF).collect()[0]
    # md5 score is independent of the click label, so AUC ~ 0.5
    assert 0.40 <= row.auc <= 0.60
    assert row.u_times2 <= 2 * row.n_pos * row.n_neg
    assert row.n_pos > 0 and row.n_neg > 0


def test_pr_curve_threshold_zero_predicts_everything(spark):
    rows = {r.t: r for r in QUERIES["pr_curve_deciles"](spark, SF).collect()}
    assert len(rows) == 10
    r0 = rows[0]
    assert r0.fn == 0 and r0.tn == 0
    assert r0.recall_micro == 1000000
    n = r0.tp + r0.fp
    for r in rows.values():
        assert r.tp + r.fp + r.fn + r.tn == n
    # recall is monotone non-increasing in the threshold
    recalls = [rows[t].recall_micro for t in range(10)]
    assert recalls == sorted(recalls, reverse=True)


def test_kappa_matches_the_constructed_agreement_rate(spark):
    row = QUERIES["cohens_kappa"](spark, SF).collect()[0]
    # rater B flips one class on a 1-in-4 md5 coin -> po ~ 0.75
    assert 700000 <= row.po_micro <= 800000
    # chance-corrected agreement sits well below po but stays strong
    assert 0.45 <= row.kappa <= 0.75
    assert row.pe_num < row.n * row.n


def test_ari_positive_for_nested_prefix_clusterings(spark):
    row = QUERIES["clustering_ari"](spark, SF).collect()[0]
    # 3-token prefixes refine 2-token prefixes -> strong positive ARI
    assert row.ari is None or 0.0 < row.ari <= 1.0
    assert row.sij <= min(row.sa, row.sb)
    assert row.cn2 == row.n * (row.n - 1) // 2


def test_zone_maps_prune_only_under_the_clustered_layout(spark):
    rows = {r.layout: r for r in QUERIES["zone_map_skipping"](spark, SF).collect()}
    assert set(rows) == {"hash", "time"}
    h, t = rows["hash"], rows["time"]
    # pruning changes I/O, never answers
    assert h.rows_matching == t.rows_matching
    assert t.files_read < h.files_read
    assert t.rows_scanned < h.rows_scanned
    assert t.rows_scanned >= t.rows_matching


def test_happens_before_support_is_tie_free_and_symmetric(spark):
    rows = QUERIES["happens_before_pairs"](spark, SF).collect()
    by_pair = {(r.a, r.b): r for r in rows}
    assert len(by_pair) == 20
    for (a, b), r in by_pair.items():
        rev = by_pair[(b, a)]
        assert rev.n_users_both == r.n_users_both
        # strict < on both directions leaves ties with neither
        assert r.n_a_before_b + rev.n_a_before_b <= r.n_users_both


def test_dhondt_allocates_all_seats_monotonically(spark):
    rows = QUERIES["dhondt_apportionment"](spark, SF).collect()
    assert sum(r.seats for r in rows) == 100
    ordered = sorted(rows, key=lambda r: r.votes, reverse=True)
    for hi, lo in zip(ordered, ordered[1:]):
        if hi.votes > lo.votes:
            assert hi.seats >= lo.seats


def test_pps_sample_is_exactly_k_and_share_normalized(spark):
    rows = QUERIES["pps_sample"](spark, SF).collect()
    assert sum(r.n_sampled for r in rows) == 200
    total = sum(r.sample_share_micro for r in rows)
    assert 1000000 - len(rows) <= total <= 1000000


def test_grouped_weighted_median_matches_window_form(spark):
    # independent check against the naive cumulative-window definition
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.windows import (
        grouped_weighted_median,
    )
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources import (
        load_table,
    )

    l = load_table(spark, SF, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    got = {
        r.l_returnflag: (r.m, r.total_weight)
        for r in grouped_weighted_median(
            l, ["l_returnflag"], "v", "w", ["l_orderkey", "l_linenumber"], "m"
        ).collect()
    }
    win = Window.partitionBy("l_returnflag").orderBy(
        "v", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy("l_returnflag")
    naive = (
        l.withColumn("cumw", F.sum("w").over(win))
        .withColumn("totw", F.sum("w").over(tot))
        .groupBy("l_returnflag")
        .agg(
            F.min(F.when(2 * F.col("cumw") >= F.col("totw"), F.col("v"))).alias(
                "m"
            ),
            F.min("totw").alias("totw"),
        )
    )
    want = {r.l_returnflag: (r.m, r.totw) for r in naive.collect()}
    assert got == want


def test_grouped_weighted_median_reserved_name_guard(spark):
    import pytest as _pytest

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.windows import (
        grouped_weighted_median,
    )

    df = spark.range(4).selectExpr("id", "id AS _cumw", "1 AS w")
    with _pytest.raises(ValueError, match="rename columns"):
        grouped_weighted_median(df, ["id"], "id", "w", [])


def test_levenshtein_pairs_are_blocked_and_bounded(spark):
    rows = QUERIES["levenshtein_pairs"](spark, SF).collect()
    assert rows, "expected near-match pairs within noun blocks"
    for r in rows:
        assert r.name_a < r.name_b
        assert r.name_a.split(" ")[1] == r.blk == r.name_b.split(" ")[1]
        assert 1 <= r.dist <= 3


def test_fd_audit_flags_violations_with_consistent_g3(spark):
    rows = {r.fd: r for r in QUERIES["functional_dependency_audit"](spark, SF).collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert r.violating_groups <= r.lhs_groups
        # a violating group loses at least one row in the G3 repair
        assert (r.g3_rows == 0) == (r.violating_groups == 0)
        assert r.g3_rows >= r.violating_groups


def test_rake_scores_favor_phrase_cohabitants(spark):
    rows = QUERIES["rake_keyphrases"](spark, SF).collect()
    assert len(rows) == 20
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.text import (
        STOPWORDS,
    )

    for r in rows:
        assert r.tok not in STOPWORDS
        # degree counts each occurrence's whole phrase, so degree >= freq
        assert r.degree >= r.freq
        assert r.score_micro == r.degree * 1000000 // r.freq
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_limit_offset_page_is_rows_41_to_60(spark):
    import pyspark.sql.functions as F

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources import (
        load_table,
    )

    page = QUERIES["limit_offset_page"](spark, SF).collect()
    assert len(page) == 20
    full = (
        load_table(spark, SF, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(60)
        .collect()
    )
    assert [r.o_orderkey for r in page] == [r.o_orderkey for r in full[40:60]]


def test_jsd_is_small_for_homogeneous_halves_and_bounded(spark):
    row = QUERIES["jsd_source_divergence"](spark, SF).collect()[0]
    # both halves draw from the same generator vocab: JSD well below ln(2)
    assert 0 <= row.jsd_micronats < 693147
    assert row.vocab_size > 0
    assert row.tokens_a > 0 and row.tokens_b > 0


def test_rle_estimate_orders_columns_by_compressibility(spark):
    rows = {r.col_name: r for r in QUERIES["rle_compression_estimate"](spark, SF).collect()}
    assert set(rows) == {"l_returnflag", "l_linestatus", "l_quantity", "l_shipdate"}
    for r in rows.values():
        assert r.n_distinct <= r.n_runs <= r.n_rows
        assert r.rle_ratio_micro <= 1000000
    # 2-3 value flags run far better than a near-unique measure column
    assert rows["l_linestatus"].n_runs < rows["l_quantity"].n_runs


def test_cdc_chunk_dedup_accounting_is_consistent(spark):
    r = QUERIES["cdc_chunk_dedup"](spark, SF).collect()[0]
    assert r.distinct_chunks <= r.total_chunks
    assert r.stored_bytes <= r.logical_bytes
    assert 0 <= r.savings_micro < 1000000
    # tiny shared vocab -> content-defined chunks repeat across docs
    assert r.distinct_chunks < r.total_chunks


def test_two_level_rollup_agrees_with_single_level_on_emitted_hours(spark):
    import pyspark.sql.functions as F

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources import (
        load_table,
    )

    out = QUERIES["stream_two_level_hourly"](spark, SF)
    rows = out.collect()
    assert rows, "bounded replay should emit fully-watermarked hours"
    got = {(r.window_start_us, r.event_type): (r.n_events, r.n_quarters) for r in rows}
    e = load_table(spark, SF, "events")
    batch = (
        e.select(
            (F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000") * 3600000000).alias("hs"),
            (F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 900000000")).alias("qs"),
            "event_type",
        )
        .groupBy("hs", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("qs").alias("nq"))
        .collect()
    )
    want = {(r.hs, r.event_type): (r.n, r.nq) for r in batch}
    for k, v in got.items():
        assert want[k] == v
        assert 1 <= v[1] <= 4


def test_pinball_loss_q90_leaves_a_tenth_above(spark):
    rows = QUERIES["pinball_loss_eval"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.pinball10_sum >= 0
        assert r.avg_pinball_micro == r.pinball10_sum * 100000 // r.n


def test_brier_score_of_uninformed_scorer_is_near_one_third(spark):
    r = QUERIES["brier_score"](spark, SF).collect()[0]
    # uniform p vs base-rate pi labels: E[(p-y)^2] = 1/3 - pi/3 + pi... for
    # pi ~ 0.2 the value sits near 0.33; assert a generous band
    assert 0.25 <= r.brier <= 0.45
    assert 0 < r.n_pos < r.n


def test_reciprocal_best_match_is_a_partial_bijection(spark):
    rows = QUERIES["reciprocal_best_match"](spark, SF).collect()
    assert rows
    dirties = [r.dirty for r in rows]
    cleans = [r.clean for r in rows]
    assert len(dirties) == len(set(dirties))
    assert len(cleans) == len(set(cleans))
    # the leet corruption inverts: each dirty name should link its origin
    for r in rows:
        assert r.dist <= 4


def test_golden_record_splits_value_and_type_provenance(spark):
    import pyspark.sql.functions as F

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources import (
        load_table,
    )

    rows = QUERIES["golden_record_survivorship"](spark, SF).collect()
    e = load_table(spark, SF, "events")
    n_users = e.select("user_id").distinct().count()
    assert len(rows) == n_users
    # at least one user's newest event is an error while an older
    # non-error event supplies the value (the field-level split)
    split = [
        r for r in rows
        if r.latest_type == "error" and r.latest_value_cents is not None
    ]
    assert split, "expected at least one field-level provenance split"
    for r in rows:
        assert r.n_nonerror <= r.n_events


def test_kaplan_meier_risk_set_shrinks_and_log_survival_decreases(spark):
    rows = sorted(
        QUERIES["kaplan_meier_churn"](spark, SF).collect(), key=lambda r: r.t_hour
    )
    assert rows
    # at-risk counts are non-increasing over time
    risks = [r.n_risk for r in rows]
    assert risks == sorted(risks, reverse=True)
    # log-survival is non-increasing until (if ever) it hits zero
    prev = 0
    for r in rows:
        if r.surv_zero:
            assert r.log_surv_micro is None
        else:
            assert r.log_surv_micro <= prev
            prev = r.log_surv_micro
        assert r.d + r.c <= r.n_risk


def test_bitemporal_asof_exposes_late_arriving_revisions(spark):
    rows = QUERIES["bitemporal_asof"](spark, "/root/testdata/sf0.01").collect()
    assert rows
    revised = [r for r in rows if r.revised]
    stable = [r for r in rows if not r.revised]
    # the 10-min knowledge cutoff vs 0-59-min tx delays must split both ways
    assert revised, "expected versions not yet ingested at T"
    assert stable, "expected versions already ingested at T"
    for r in stable:
        assert r.value_known_at_t == r.value_known_now


def test_weighted_band_is_ordered_and_brackets_the_median(spark):
    rows = QUERIES["weighted_price_band"](spark, SF).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.p25_cents <= r.p50_cents <= r.p75_cents
        assert r.total_weight > 0


def test_dp_clipped_mean_caps_contributions_and_values(spark):
    r = QUERIES["dp_clipped_mean"](spark, SF).collect()[0]
    assert r.n_contrib <= 8 * r.n_users
    assert 0 <= r.clipped_sum <= 20000 * r.n_contrib
    # the frozen draw is nonzero and bounded by a few scales
    assert r.noise_cents != 0
    assert abs(r.noise_cents) < 20000 * 10


def test_assortativity_is_a_valid_correlation(spark):
    r = QUERIES["degree_assortativity"](spark, SF).collect()[0]
    assert -1.0 <= r.assortativity <= 1.0
    assert r.n_edges > 0


def test_ips_policy_eval_bounds(spark):
    r = QUERIES["ips_policy_eval"](spark, SF).collect()[0]
    assert 1 <= r.n_types_matched <= 5
    assert r.ips_value_cents >= 0
    # SNIPS normalizes by matched mass: a per-event value estimate in
    # micro-cents, same order as the raw per-event reward
    assert r.snips_value_micro is not None and r.snips_value_micro > 0


def test_top_user_paths_are_valid_triples(spark):
    rows = QUERIES["top_user_paths"](spark, SF).collect()
    assert len(rows) == 20
    counts = [r.n_travels for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        steps = r.path.split(">")
        assert len(steps) == 3
        assert r.n_users <= r.n_travels


def test_two_level_restart_drops_late_quarters_and_restores_both_stores(spark):
    import pyspark.sql.functions as F

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources import (
        load_table,
    )
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.streaming.windowed import (
        restart_two_level_counts,
    )

    e = load_table(spark, SF, "events")
    out, stats = restart_two_level_counts(
        spark,
        phase1=e.filter(F.col("user_id") % 3 == 0),
        phase2=e.filter(F.col("user_id") % 3 != 0),
        lateness="20 minutes",
        group_cols=["event_type"],
    )
    assert stats["phase1"]["n_state_ops"] == 2
    assert stats["phase2"]["n_state_ops"] == 2
    assert stats["phase2"]["rows_dropped"] > 0
    rows = out.collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_quarters <= 4


def test_isotonic_fit_is_monotone_and_pools_violations(spark):
    rows = sorted(
        QUERIES["isotonic_calibration"](spark, SF).collect(), key=lambda r: r.bin
    )
    assert len(rows) == 10
    fits = [r.iso_micro for r in rows]
    assert fits == sorted(fits), "isotonic fit must be monotone non-decreasing"
    raw = [r.acc_micro for r in rows]
    if raw != sorted(raw):
        # raw violations exist -> PAVA must have pooled somewhere
        assert any(a != f for a, f in zip(raw, fits))
    # pooling preserves the overall level: fit stays within raw range
    assert min(raw) <= min(fits) and max(fits) <= max(raw)


def test_shapley_credits_sum_to_the_grand_coalition_gain(spark):
    rows = QUERIES["shapley_attribution"](spark, SF).collect()
    assert len(rows) == 4
    # efficiency axiom: Σφ = v(grand) − v(∅), in 24th units
    total = sum(r.phi_24ths for r in rows)
    assert total > 0
    assert total % 24 == 0 or total >= 0  # exact 24th-units bookkeeping
    shares = [r.share_micro for r in rows]
    assert abs(sum(shares) - 1000000) <= len(rows)
    for r in rows:
        assert r.phi_24ths >= 0  # v is monotone (superset never loses users)


def test_doubly_robust_combines_dm_and_correction(spark):
    r = QUERIES["doubly_robust_ope"](spark, SF).collect()[0]
    assert r.dr_value_micro >= 0
    # identity up to the two independent floors
    assert abs((r.dm_value_micro + r.correction_micro) - r.dr_value_micro) <= 2
    ips = QUERIES["ips_policy_eval"](spark, SF).collect()[0]
    # DR and SNIPS estimate the same quantity: same order of magnitude
    assert r.dr_value_micro > 0 and ips.snips_value_micro > 0


def test_per_vertex_triangles_sum_to_three_times_census(spark):
    import pyspark.sql.functions as F

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.graph import (
        per_vertex_triangles,
        triangle_count,
    )
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources import (
        load_table,
    )

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    x, y = li.alias("x"), li.alias("y")
    edges = x.join(
        y,
        (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
        & (F.col("x.l_partkey") < F.col("y.l_partkey")),
    ).select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b"))
    pv = per_vertex_triangles(edges, "a", "b")
    total = pv.agg(F.sum("n_triangles")).collect()[0][0]
    census = triangle_count(edges, "a", "b").collect()[0]
    assert total == 3 * census.n_triangles
    assert pv.count() == census.n_nodes
    for r in QUERIES["local_clustering_topk"](spark, SF).collect():
        assert 0 <= r.coeff_micro <= 1000000


def test_group_folds_never_leak_users(spark):
    rows = QUERIES["grouped_kfold_audit"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.users_spanning_folds == 0
        assert r.n_users <= r.n_rows
    assert abs(sum(r.row_share_micro for r in rows) - 1000000) <= 5


def test_dispersion_index_flags_bursty_arrivals(spark):
    rows = QUERIES["dispersion_index"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.mean_per_user > 0
        assert r.dispersion_index >= 0


def test_mann_kendall_z_is_finite_and_tie_corrected(spark):
    rows = QUERIES["mann_kendall_trend"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r.s) <= r.n * (r.n - 1) // 2
        assert 0 < r.var18 <= r.n * (r.n - 1) * (2 * r.n + 5)
        assert abs(r.z) < 50


def test_cuped_reduction_is_a_squared_correlation(spark):
    r = QUERIES["cuped_adjustment"](spark, SF).collect()[0]
    assert 0.0 <= r.variance_reduction <= 1.0
    assert r.n > 0


def test_emd_is_bounded_by_the_value_range(spark):
    r = QUERIES["emd_value_drift"](spark, SF).collect()[0]
    assert 0 <= r.emd_micro_of_range <= 1000000
    assert r.na > 0 and r.nb > 0


def test_seasonal_profile_has_one_peak_per_type_and_mean_index_flat(spark):
    rows = QUERIES["seasonal_profile"](spark, SF).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, cells in by_type.items():
        assert sum(1 for c in cells if c.is_peak_hour) == 1
        # indices average to flat: Σ over the 24 cells ≈ 24·1e6
        # (each cell floors once, so the sum undershoots by < 24)
        assert len(cells) == 24
        total_idx = sum(c.seasonal_index_micro for c in cells)
        assert 24 * 1000000 - 24 <= total_idx <= 24 * 1000000
