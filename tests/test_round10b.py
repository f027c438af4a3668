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
