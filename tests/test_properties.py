"""Property-based invariant tests (hypothesis) for the core merge and
dedup algebra — the invariants the reference enforced operationally
(SURVEY §5), checked over generated inputs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup import (
    dedup_against_target,
)
from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.merge import (
    upsert,
)

KEYS = st.sampled_from(["a", "b", "c", "d", "e"])
ROWS = st.lists(
    st.tuples(KEYS, st.integers(0, 50), st.integers(-100, 100)),
    min_size=0,
    max_size=12,
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(target=ROWS, updates=ROWS)
@SLOW
def test_upsert_is_idempotent_and_key_complete(spark, target, updates):
    cols = ["id", "ver", "v"]
    t = spark.createDataFrame(target, cols) if target else spark.createDataFrame([], "id string, ver long, v long")
    u = spark.createDataFrame(updates, cols) if updates else spark.createDataFrame([], "id string, ver long, v long")
    m1 = upsert(t, u, "id", version_col="ver")
    r1 = sorted(map(tuple, m1.collect()))
    # idempotence: applying the same batch again changes nothing
    m2 = upsert(m1, u, "id", version_col="ver")
    assert sorted(map(tuple, m2.collect())) == r1
    # key completeness: result keys == target keys ∪ update keys
    assert {r[0] for r in r1} == {r[0] for r in target} | {r[0] for r in updates}
    # uniqueness: one row per key after merge of a unique-keyed target
    if len({r[0] for r in target}) == len(target):
        assert len({r[0] for r in r1}) == len(r1)


@given(batch=ROWS, target=ROWS)
@SLOW
def test_dedup_against_target_never_emits_known_or_dup_keys(spark, batch, target):
    cols = ["id", "ver", "v"]
    b = spark.createDataFrame(batch, cols) if batch else spark.createDataFrame([], "id string, ver long, v long")
    t = spark.createDataFrame(target, cols) if target else spark.createDataFrame([], "id string, ver long, v long")
    out = [r[0] for r in dedup_against_target(b, t, "id").collect()]
    assert len(out) == len(set(out))                      # no dup keys emitted
    assert not (set(out) & {r[0] for r in target})        # no known keys
    assert set(out) == {r[0] for r in batch} - {r[0] for r in target}


PACK_TOKENS = st.lists(st.integers(1, 40), min_size=1, max_size=20)


@given(toks=PACK_TOKENS)
@SLOW
def test_packing_partitions_every_budget(spark, toks):
    from pyspark.sql import functions as F

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.packing import (
        pack_documents,
    )

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for budget in (7, 64):
        out = pack_documents(
            df, "doc_id", F.size(F.split(F.col("text"), " ")), budget=budget
        ).collect()
        # exact tiling: starts are a permutation of the exclusive
        # prefix sums of n_tok in md5 order, regardless of budget
        assert sorted(r["start"] for r in out) == sorted(
            s for s in _excl_prefix(sorted((r["start"], r["n_tok"]) for r in out))
        )
        total = sum(r["n_tok"] for r in out)
        assert all(0 <= r["start"] < total for r in out)
        assert all(r["bin_id"] == r["start"] // budget for r in out)


def _excl_prefix(pairs):
    acc = 0
    out = []
    for _start, n in pairs:
        out.append(acc)
        acc += n
    return out


@given(
    edges=st.lists(
        st.tuples(st.sampled_from("abcd"), st.sampled_from("wxyz")),
        min_size=1,
        max_size=10,
        unique=True,
    ),
    iters=st.integers(1, 3),
)
@SLOW
def test_pagerank_matches_reference_recurrence(spark, edges, iters):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.pagerank import (
        SCALE,
        pagerank,
    )

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["pr_scaled"] for r in pagerank(df, iterations=iters).collect()}

    # plain-python replay of the exact integer recurrence
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (15 * SCALE) // (100 * n)
    pr = {v: SCALE // n for v in nodes}
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for s, d in edges:
            nxt[d] += (pr[s] * 85) // (100 * outdeg[s])
        pr = nxt
    assert got == pr


@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=50), min_size=1, max_size=6
    ),
    chunk=st.integers(2, 20),
)
@SLOW
def test_chunking_covers_every_character(spark, texts, chunk):
    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.chunking import (
        chunk_documents,
    )

    stride = max(1, chunk - 1)  # overlap of 1: stride <= chunk
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_documents(df, chunk_chars=chunk, stride=stride).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in rows:
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_start"])
        # chunk count: one per stride step while the start is in-text
        assert len(chunks) == (1 if len(t) == 0 else (len(t) - 1) // stride + 1)
        # with stride <= chunk, every character index is inside a chunk
        covered = set()
        for r in chunks:
            covered.update(
                range(r["chunk_start"], r["chunk_start"] + r["chunk_chars"])
            )
        assert covered == set(range(len(t)))


EDGE_LISTS = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=0,
    max_size=40,
)


@given(edges=EDGE_LISTS)
@SLOW
def test_partitioned_components_equals_pure_union_find(spark, edges):
    """Contraction-based components == a pure-Python union-find on any
    random edge set — the property the whole dedup-cluster family
    rests on (block-local labels + contracted-graph resolution must
    lose nothing across hash blocks)."""
    from pyspark.sql import Row

    from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.graph import (
        partitioned_components,
    )

    nodes = spark.createDataFrame([Row(id=i) for i in range(31)])
    edf = (
        spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
        if edges
        else spark.createDataFrame([], "src long, dst long")
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in partitioned_components(nodes, edf, num_blocks=4).collect()
    }

    parent = list(range(31))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    comp_min = {}
    for i in range(31):
        comp_min.setdefault(find(i), i)
    for i in range(31):
        want[i] = comp_min[find(i)]
    assert got == want


from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.graph import (  # noqa: E402
    triangle_count,
)

EDGE = st.tuples(st.integers(0, 7), st.integers(0, 7))


@given(edges=st.lists(EDGE, min_size=0, max_size=20))
@SLOW
def test_triangle_count_matches_bruteforce(spark, edges):
    from itertools import combinations

    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = {n for e in canon for n in e}
    brute = sum(
        1
        for t in combinations(sorted(nodes), 3)
        if {(t[0], t[1]), (t[0], t[2]), (t[1], t[2])} <= canon
    )
    df = (
        spark.createDataFrame(list(edges), ["s", "d"])
        if edges
        else spark.createDataFrame([], "s long, d long")
    )
    row = triangle_count(df, "s", "d").collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (
        len(nodes),
        len(canon),
        brute,
    )


from implementing_a_data_lake_using_mongodb_integrated_with_bigquery_spark.operators.dedup_near import (  # noqa: E402
    containment_pairs,
)

WORDS = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
DOCS = st.lists(
    st.lists(WORDS, min_size=3, max_size=8).map(" ".join),
    min_size=1,
    max_size=5,
)


@given(texts=DOCS)
@SLOW
def test_containment_pairs_match_bruteforce(spark, texts):
    def sh(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sets = {i: sh(t) for i, t in enumerate(texts)}
    brute = {
        (a, b): len(sets[a] & sets[b])
        for a in sets
        for b in sets
        if a != b and 5 * len(sets[a] & sets[b]) >= 4 * len(sets[a])
    }
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r.src, r.dst): r.shared for r in containment_pairs(df).collect()
    }
    assert got == brute
