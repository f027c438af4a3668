"""Unit tests: PMI collocations, transition matrix, quantize audit."""

from __future__ import annotations

import math

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.collocations import (
    pmi_collocations,
    transition_matrix,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.quantize import (
    quantize_audit,
)


def test_pmi_prefers_exclusive_pair(spark):
    # "new york" always adjacent; "the cat" share "the" with much else
    docs = [
        (1, "new york is big the cat sat the dog ran"),
        (2, "new york has the cat and the bird"),
        (3, "new york again the end"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r.w1, r.w2): r for r in pmi_collocations(df, min_count=2, k=100).collect()}
    ny = got[("new", "york")]
    assert ny.n_pair == 3 and ny.n_w1 == 3 and ny.n_w2 == 3
    n_tokens = sum(len(t.split()) for _, t in docs)
    assert ny.pmi == round(math.log(n_tokens * 3 / (3 * 3)), 6)
    assert ny.pmi > got[("the", "cat")].pmi


def test_pmi_min_count_filters_hapax(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    assert pmi_collocations(df, min_count=2, k=10).count() == 0


def test_transition_matrix_probabilities(spark):
    # user 1: a->b->a->b ; user 2: a->c
    rows = [
        (1, 1, 1, "a"), (2, 1, 2, "b"), (3, 1, 3, "a"), (4, 1, 4, "b"),
        (5, 2, 1, "a"), (6, 2, 2, "c"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "state"])
    got = {
        (r.from_state, r.to_state): (r.n_transitions, r.p)
        for r in transition_matrix(df, "user_id", "ts", "state", "event_id").collect()
    }
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    assert got[("a", "c")] == (1, round(1 / 3, 6))
    assert got[("b", "a")] == (1, 1.0)
    # no cross-user transition (user 2's 'a' never precedes user 1's)
    assert ("c", "a") not in got


def test_quantize_audit_exact_for_representable_vectors(spark):
    # vector whose entries are exact multiples of its scale: max=127
    # → scale=1, every entry integral → zero reconstruction error
    df = spark.createDataFrame(
        [(1, [127.0, 64.0, -32.0]), (2, [0.0, 0.0, 0.0]), (3, [1.0, 0.5, 0.25])],
        ["vec_id", "embedding"],
    )
    got = {r.vec_id: r for r in quantize_audit(df).collect()}
    assert 2 not in got  # zero vector dropped
    assert got[1].max_abs_err == 0.0 and got[1].cos_recon == 1.0
    # 8-bit quantization of a smooth vector keeps cosine near 1
    assert got[3].cos_recon > 0.9999
    assert got[3].max_abs_err <= got[3].scale / 2 + 1e-12
