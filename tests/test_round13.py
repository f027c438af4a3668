"""Round-13 regression tests: driver-window round-robin rotation."""

from __future__ import annotations

import __spark_entry__ as entry
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark import registry


def test_rotation_is_permutation_and_head_pinned():
    """_rotated emits every query exactly once; the window head is the
    pinned fragile prefix (no unverified queries exist at test time for
    names already folded into _DRIVER_VERIFIED)."""
    m = dict(registry.QUERIES)
    names = list(entry._rotated(m))
    assert len(names) == len(set(names)) == len(m)
    fragile_all = [k for k in dict.fromkeys(entry._FRAGILE_FIRST)]
    unverified = [n for n in names if n not in entry._DRIVER_VERIFIED]
    head_start = len(unverified)
    expect_head = [k for k in fragile_all
                   if k in entry._DRIVER_VERIFIED][: entry._FRAGILE_HEAD]
    # unverified names (if any new queries exist) lead; then the pinned
    # fragile head, in _FRAGILE_FIRST order
    pinned = [n for n in names[head_start:head_start + entry._FRAGILE_HEAD]]
    assert pinned == expect_head


def test_rotation_sweeps_all_queries(monkeypatch):
    """The round-robin cursor must re-verify every stale green within
    one full cycle (~12 rounds at stride 30) — the r12 verdict's
    static-window fix. Coverage is guaranteed as long as the rotating
    slice (50 − head − new queries) stays ≥ the stride, which the
    window composition check below pins for the current registry."""
    m = dict(registry.QUERIES)
    unverified = [k for k in m if k not in entry._DRIVER_VERIFIED]
    slice_size = 50 - entry._FRAGILE_HEAD - len(unverified)
    assert slice_size >= entry._ROTATION_STRIDE, (
        "rotating slice smaller than stride — stale greens would skip"
    )
    seen = set()
    n_rounds = -(-len(m) // entry._ROTATION_STRIDE) + 1
    for r in range(13, 13 + n_rounds):
        monkeypatch.setattr(entry, "_round_number", lambda r=r: r)
        names = list(entry._rotated(m))
        assert len(names) == len(set(names)) == len(m)
        seen |= set(names[:50])
    assert seen == set(m), f"never-windowed: {sorted(set(m) - seen)[:10]}"


def test_round_number_counts_correctness_artifacts():
    """Cursor derives from driver artifacts: 12 CORRECTNESS files on
    disk during round 13."""
    import glob
    import os

    here = os.path.dirname(os.path.abspath(entry.__file__))
    n = len(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    assert entry._round_number() == n + 1


def test_substring_apply_exact_rescues_tail_content(spark):
    """The r12 ADVICE over-deletion case: content duplicated only
    among REMOVED runs loses every copy under the run-granular policy
    but keeps its gram-representative copy under the token-exact one."""
    import hashlib

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
        substring_dedup_apply,
        substring_dedup_apply_exact,
    )

    s = " ".join(f"w{i}" for i in range(22))  # 22 tokens
    e = " ".join(f"e{i}" for i in range(10))  # 10-token tail extension
    docs = spark.createDataFrame(
        [
            (1, s),                      # run [1,22]; group rep
            (2, s + " " + e),            # run [1,32]; removed whole
            (3, s + " " + e + " u0 u1"),  # run [1,32]; removed whole
        ],
        "doc_id long, text string",
    )
    run = {r["doc_id"]: r for r in substring_dedup_apply(docs, 20).collect()}
    ex = {
        r["doc_id"]: r
        for r in substring_dedup_apply_exact(docs, 20).collect()
    }
    # run-granular: doc 2 loses everything (the ADVICE over-deletion —
    # e0..e9 is duplicated between docs 2 and 3 yet every copy dies)
    assert run[2]["n_tokens_kept"] == 0 and run[2]["kept_md5"] is None
    assert run[3]["n_tokens_kept"] == 2
    # token-exact: the straddling grams' corpus-min occurrences are in
    # doc 2 → positions 4..32 rescued; e0..e9 keeps a contiguous copy
    assert ex[1]["n_tokens_removed"] == 0
    assert ex[2]["n_tokens_removed"] == 3
    assert ex[2]["n_tokens_rescued"] == 29
    kept2 = " ".join(f"w{i}" for i in range(3, 22)) + " " + e
    assert ex[2]["kept_md5"] == hashlib.md5(kept2.encode()).hexdigest()
    assert ex[3]["n_tokens_removed"] == 32 and ex[3]["n_tokens_rescued"] == 0
    assert ex[3]["kept_md5"] == hashlib.md5(b"u0 u1").hexdigest()
    # n_spans_removed is the run-granular span count in both variants
    assert all(ex[d]["n_spans_removed"] == run[d]["n_spans_removed"]
               for d in (1, 2, 3))


def test_substring_apply_exact_subset_parity(spark, sf_dir):
    """Token-exact removals ⊆ run-granular removals on the real
    documents table, with the rescue identity
    exact_removed = run_removed − rescued holding per doc."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
        substring_dedup_apply,
        substring_dedup_apply_exact,
    )
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    run = {r["doc_id"]: r for r in substring_dedup_apply(docs, 20).collect()}
    ex = {
        r["doc_id"]: r
        for r in substring_dedup_apply_exact(docs, 20).collect()
    }
    assert set(run) == set(ex)
    assert any(r["n_tokens_removed"] > 0 for r in run.values())
    for d, rr in run.items():
        er = ex[d]
        assert er["n_tokens_removed"] <= rr["n_tokens_removed"]
        assert (
            er["n_tokens_removed"] + er["n_tokens_rescued"]
            == rr["n_tokens_removed"]
        )
        assert er["n_tokens_kept"] == er["n_tokens"] - er["n_tokens_removed"]
        if er["n_tokens_removed"] == rr["n_tokens_removed"]:
            # identical cut set ⇒ identical kept text
            assert er["kept_md5"] == rr["kept_md5"]


def test_kn_perplexity_filter_math(spark):
    """KN surprisal on a hand-checkable corpus matches a pure-Python
    replica of the formula, and the relative operating point keeps
    docs at-or-below the integer corpus-mean score."""
    import math
    from collections import Counter

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.collocations import (
        kn_perplexity_filter,
    )

    texts = {
        1: "a b c a b c a b d",
        2: "a b c x y z a b c",
        3: "p q r s p q r s p q",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in kn_perplexity_filter(docs).collect()}

    # pure-Python replica of the model definition
    tri = Counter()
    for s in texts.values():
        t = s.split()
        for i in range(len(t) - 2):
            tri[(t[i], t[i + 1], t[i + 2])] += 1
    big, lvl2 = Counter(), Counter()
    nf = Counter()
    for (w1, w2, w3), c in tri.items():
        big[(w1, w2)] += c
        nf[(w1, w2)] += 1
        lvl2[(w2, w3)] += 1
    tot2, types2, uni = Counter(), Counter(), Counter()
    for (w2, w3), c in lvl2.items():
        tot2[w2] += c
        types2[w2] += 1
        uni[w3] += 1
    btot = len(lvl2)

    def micro(w1, w2, w3):
        pu = uni[w3] / btot
        p2 = (lvl2[(w2, w3)] - 0.75) / tot2[w2] + (
            0.75 * types2[w2] / tot2[w2]
        ) * pu
        p3 = (tri[(w1, w2, w3)] - 0.75) / big[(w1, w2)] + (
            0.75 * nf[(w1, w2)] / big[(w1, w2)]
        ) * p2
        return round(-math.log(p3) * 1e6)

    expected = {}
    for d, s in texts.items():
        t = s.split()
        ms = [micro(*t[i : i + 3]) for i in range(len(t) - 2)]
        expected[d] = (len(ms), sum(ms), sum(ms) // len(ms))
    for d, (n, tot, mean) in expected.items():
        assert rows[d]["n_trigrams"] == n
        assert rows[d]["surprisal_micronats"] == tot
        assert rows[d]["mean_micronats"] == mean
    thr = sum(m for _, _, m in expected.values()) // len(expected)
    for d in texts:
        assert rows[d]["keep"] == (expected[d][2] <= thr)
    assert any(r["keep"] for r in rows.values())


def test_kn_perplexity_filter_short_docs_drop(spark):
    """Documents with <3 tokens carry no trigram signal and drop
    symmetrically (the oracle's occ CTE generates no rows for them)."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.collocations import (
        kn_perplexity_filter,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "x"), (3, "a b c d")],
        "doc_id long, text string",
    )
    got = {r["doc_id"] for r in kn_perplexity_filter(docs).collect()}
    assert got == {3}


def test_semdedup_centroid_prune_semantics(spark):
    """Identical vectors share a (cell, bucket) and only the min id
    survives; a far-away direction keeps independently; every vector
    appears exactly once with a keep flag."""
    import hashlib as _h  # noqa: F401  (keep import style consistent)

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
        pq_codebooks,
        semdedup_centroid_prune,
    )

    dim = 64
    base = [((i * 37) % 101 - 50) / 100.0 for i in range(dim)]
    other = [((i * 53) % 89 - 44) / -90.0 for i in range(dim)]
    rows = [(1, base), (2, base), (7, base), (9, other)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    cents = pq_codebooks(1, 8, dim)[0]
    out = {
        r["vec_id"]: r
        for r in semdedup_centroid_prune(emb, cents, dim=dim).collect()
    }
    assert set(out) == {1, 2, 7, 9}
    # identical vectors: identical cell/bucket, only min id kept
    assert (
        out[1]["cell"] == out[2]["cell"] == out[7]["cell"]
        and out[1]["bucket"] == out[2]["bucket"] == out[7]["bucket"]
    )
    assert out[1]["keep"] and not out[2]["keep"] and not out[7]["keep"]
    assert out[9]["keep"]  # alone in its (cell, bucket)
    assert all(-1000000 <= r["cos_micro"] <= 1000000 for r in out.values())


def test_semdedup_verified_prune_semantics(spark, sf_dir):
    """Verified SemDeDup: identical vectors (rep-cosine ≈ 1.0) are
    still dropped, but screen candidates below the rep-cosine
    threshold are rescued — verified keeps ⊇ pairs-free keeps on the
    real embeddings table."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
        pq_codebooks,
        semdedup_centroid_prune,
        semdedup_verified_prune,
    )
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
        load_table,
    )

    dim = 64
    cents = pq_codebooks(1, 8, dim)[0]
    base = [((i * 37) % 101 - 50) / 100.0 for i in range(dim)]
    emb = spark.createDataFrame(
        [(1, base), (2, base), (9, [-v for v in base])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r
        for r in semdedup_verified_prune(emb, cents, dim=dim).collect()
    }
    assert out[1]["keep"]  # representative
    assert not out[2]["keep"]  # identical → rep-cosine ≈ 1e6 ≥ threshold
    assert out[2]["cos_rep_micro"] >= 999000
    assert out[9]["keep"]
    # superset relation on the fixture corpus: every id the pairs-free
    # screen keeps is also kept by the verified variant
    corpus = load_table(spark, sf_dir, "embeddings")
    screen = {r["vec_id"]: r["keep"]
              for r in semdedup_centroid_prune(corpus, cents).collect()}
    ver = {r["vec_id"]: r["keep"]
           for r in semdedup_verified_prune(corpus, cents).collect()}
    assert set(screen) == set(ver)
    assert all(ver[i] for i, k in screen.items() if k)
    kept_v, kept_s = sum(ver.values()), sum(screen.values())
    assert kept_v >= kept_s  # verification only rescues


def test_scale_probe_replica_marker_guard(tmp_path):
    """build_replica must refuse to reuse a replica dir built at a
    different --copies (the r13 mislabeled-SF3 incident) and must
    refuse unmarked dirs that already hold replica tables."""
    import json
    import sys

    import pytest

    sys.path.insert(0, "/root/repo/tools")
    import scale_probe

    d = tmp_path / "rep"
    d.mkdir()
    (d / "_replica_copies.json").write_text(json.dumps({"copies": 10}))
    with pytest.raises(SystemExit, match="10x replica"):
        scale_probe.build_replica(str(d), copies=30)
    d2 = tmp_path / "legacy"
    d2.mkdir()
    (d2 / "events.parquet").write_text("")
    with pytest.raises(SystemExit, match="no scale marker"):
        scale_probe.build_replica(str(d2), copies=10)


def test_ssl_prototypes_prune_semantics(spark):
    """Per cell, rank 1 = highest centroid-cosine (most prototypical)
    and the top drop_ppm fraction is dropped; ranks are a permutation
    of 1..n_cell; drop count is floor(n·ppm/1e6)."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
        pq_codebooks,
        ssl_prototypes_prune,
    )

    dim = 64
    # eight vectors in two far-apart directions → two occupied cells
    base = [((i * 37) % 101 - 50) / 100.0 for i in range(dim)]
    other = [((i * 53) % 89 - 44) / -90.0 for i in range(dim)]

    def scaled(v, s):
        # same direction, perturbed tail component → distinct cosines
        out = list(v)
        out[-1] = out[-1] + s * 0.07
        return out

    rows = [(i, scaled(base, i)) for i in range(4)] + [
        (10 + i, scaled(other, i)) for i in range(4)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = pq_codebooks(1, 8, dim)[0]
    out = ssl_prototypes_prune(
        emb, cents, dim=dim, drop_ppm=250000
    ).collect()
    assert len(out) == 8
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, rs in by_cell.items():
        n = len(rs)
        ranks = sorted(r["proto_rank"] for r in rs)
        assert ranks == list(range(1, n + 1))
        drop_n = n * 250000 // 1000000
        # rank order follows cos_micro DESC (id tiebreak)
        srt = sorted(rs, key=lambda r: (-r["cos_micro"], r["vec_id"]))
        assert [r["proto_rank"] for r in srt] == list(range(1, n + 1))
        for r in rs:
            assert r["keep"] == (r["proto_rank"] > drop_n)


def test_d4_prune_composes_stages(spark, sf_dir):
    """d4_prune on the real embeddings: sem-dropped rows carry NULL
    proto_rank and keep=False; survivors' stage-2 verdicts equal an
    independent per-cell rank over the survivors; keep ⊆ sem_keep."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.similarity import (
        d4_prune,
        pq_codebooks,
    )
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = pq_codebooks(1, 8, 64)[0]
    out = d4_prune(emb, cents, dim=64, eps_micro=2000, drop_ppm=250000).collect()
    assert len(out) == emb.count()
    survivors = [r for r in out if r["sem_keep"]]
    assert survivors, "semdedup kept nothing — operating point broken"
    for r in out:
        if not r["sem_keep"]:
            assert r["proto_rank"] is None and not r["keep"]
        else:
            assert r["proto_rank"] is not None
    # independent recomputation of stage 2 over the survivors
    by_cell = {}
    for r in survivors:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, rs in by_cell.items():
        srt = sorted(rs, key=lambda r: (-r["cos_micro"], r["vec_id"]))
        drop_n = len(rs) * 250000 // 1000000
        for i, r in enumerate(srt, start=1):
            assert r["proto_rank"] == i
            assert r["keep"] == (i > drop_n)
    # both branches of the stage-2 verdict exercised
    assert any(r["keep"] for r in survivors)
    assert any(not r["keep"] for r in survivors)


def test_unimax_allocation_invariants(spark):
    """Waterfill invariants on a skewed constructed mixture: exact
    budget conservation when feasible, per-group cap never exceeded,
    capped set = ascending-capacity prefix, uniform-uncapped spread
    within 1 token; infeasible budget caps everything and the
    shortfall is visible."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.sampling import (
        unimax_allocation,
    )

    rows = [(f"s{i}", "x " * n) for i, n in enumerate([5, 5, 40, 200, 900])]
    df = spark.createDataFrame(rows, "source string, text string")
    from pyspark.sql import functions as F

    size = F.size(F.split(F.col("text").substr(F.lit(1), F.length("text") - 1), " "))
    out = unimax_allocation(
        df, ["source"], size, budget=400, epoch_cap=2
    ).collect()
    by = {r["source"]: r for r in out}
    assert sum(r["alloc_tokens"] for r in out) == 400
    for r in out:
        assert r["alloc_tokens"] <= r["capacity"]
        assert r["capacity"] == 2 * r["n_tokens"]
    # ascending-capacity prefix property
    srt = sorted(out, key=lambda r: (r["capacity"], r["source"]))
    flags = [r["capped"] for r in srt]
    assert flags == sorted(flags, reverse=True)
    # small groups capped at capacity; big groups share the rest evenly
    assert by["s0"]["capped"] and by["s0"]["alloc_tokens"] == 10
    unc = [r["alloc_tokens"] for r in out if not r["capped"]]
    assert unc and max(unc) - min(unc) <= 1
    # infeasible budget: every group capped, sum(alloc) = total capacity
    out2 = unimax_allocation(
        df, ["source"], size, budget=10_000_000, epoch_cap=1
    ).collect()
    assert all(r["capped"] for r in out2)
    assert sum(r["alloc_tokens"] for r in out2) == sum(
        r["n_tokens"] for r in out2
    )
    # epochs_micro: capped groups sit exactly at the epoch cap
    assert all(r["epochs_micro"] == 1_000_000 for r in out2)


def test_settle_load_checks_all_three_horizons(monkeypatch):
    """The r13 bench-hygiene fix: a machine that passes the 1- and
    5-min gates while the 15-MIN average is still draining must NOT
    count as quiet (the r13 run that did produced 12 phantom ≥2x
    flags, all dismissed standalone)."""
    import os as _os

    import bench

    cases = [
        ((0.5, 2.0, 3.0), True),   # genuinely quiet
        ((0.9, 2.9, 5.3), False),  # the r13 phantom-flag state
        ((0.5, 4.0, 1.0), False),  # 5-min draining
        ((3.0, 1.0, 1.0), False),  # hot right now
    ]
    for la, expect in cases:
        monkeypatch.setattr(_os, "getloadavg", lambda la=la: la)
        assert bench._settle_load(max_wait_s=0.0) is expect, la


def test_lsh_scurve_eval_semantics(spark, sf_dir):
    """S-curve evaluation on the real documents: expected_rate matches
    the analytic 1-(1-s^2)^8 at each bucket midpoint (6dp); counts are
    consistent; the high-similarity buckets are essentially all
    caught while the noise bucket is essentially all missed — the
    curve's two ends."""
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (
        lsh_scurve_eval,
    )
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.sources.tables import (
        load_table,
    )

    out = lsh_scurve_eval(load_table(spark, sf_dir, "documents")).collect()
    assert out
    for r in out:
        s = (2 * r["bucket"] + 1) / 40.0
        p = round(1.0 - (1.0 - s * s) ** 8, 6)
        assert abs(r["expected_rate"] - p) < 2e-6, (r["bucket"], p)
        assert 0 <= r["n_caught"] <= r["n_true"]
        assert r["observed_rate"] == round(r["n_caught"] / r["n_true"], 6)
    by = {r["bucket"]: r for r in out}
    top = max(by)
    assert top >= 18 and by[top]["observed_rate"] >= 0.9
    assert 0 in by and by[0]["observed_rate"] <= 0.1
