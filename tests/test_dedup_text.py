"""Unit tests for dedup / text / similarity operators on hand-built docs
with known duplicate structure."""

import pytest
from pyspark.sql import functions as F

from etl_spark.operators import dedup, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
        (3, "the quick brown fox jumps over the sleepy dog"),        # near dup of 1
        (4, "completely different content about database engines"),
        (5, "THE  QUICK  BROWN  FOX  JUMPS  OVER  THE  LAZY  DOG"),  # norm dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    groups = {r.fingerprint: r for r in dedup.exact_duplicates(docs).collect()}
    sizes = sorted(g.n_docs for g in groups.values())
    assert sizes == [1, 1, 3]  # {1,2,5} normalized-identical
    big = next(g for g in groups.values() if g.n_docs == 3)
    assert (big.min_doc_id, big.max_doc_id) == (1, 5)


def test_exact_duplicates_strict(spark, docs):
    groups = dedup.exact_duplicates(docs, normalized=False).collect()
    sizes = sorted(g.n_docs for g in groups)
    assert sizes == [1, 1, 1, 2]  # only {1,2} byte-identical


def test_shingles(spark, docs):
    sh = dedup.shingles(docs.filter("doc_id = 1"), k=3).collect()
    got = {r.shingle for r in sh}
    assert "the quick brown" in got and "the lazy dog" in got
    assert len(got) == 7  # 9 tokens → 7 shingles, all distinct


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = dedup.minhash_lsh(docs, num_hashes=16, bands=8, threshold=0.2)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert (1, 2) in got and got[(1, 2)] == 1.0       # identical
    assert (1, 3) in got and 0.2 < got[(1, 3)] < 1.0  # near dup
    assert not any(4 in p for p in got)               # unrelated doc never pairs


def test_simhash_properties(spark, docs):
    fp = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    assert fp[1] == fp[2]           # identical text → identical fingerprint
    assert 0 <= fp[1] < 2**32
    ham13 = bin(fp[1] ^ fp[3]).count("1")
    ham14 = bin(fp[1] ^ fp[4]).count("1")
    assert ham13 < ham14            # near dup closer than unrelated


def test_simhash_candidates(spark, docs):
    fp = dedup.simhash(docs)
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             dedup.simhash_candidates(fp, max_hamming=8).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs


def test_simhash_candidates_max_pairs_guard(spark):
    """The quadratic-output guard: a clique bigger than the pair budget
    fails loudly before the expansion join (default), or truncates to the
    lowest-id members deterministically."""
    import pytest

    fp = spark.createDataFrame(
        [(i, 7) for i in range(1, 6)] + [(10, 0xFFFF0000)],
        "doc_id long, simhash long",
    )  # clique of 5 → 10 pairs; the far fingerprint pairs with nobody
    with pytest.raises(ValueError, match="max_pairs_per_clique"):
        dedup.simhash_candidates(fp, max_pairs_per_clique=3)
    # budget 10 fits the clique exactly: no error, all 10 pairs emitted
    full = dedup.simhash_candidates(fp, max_pairs_per_clique=10).collect()
    assert len(full) == 10
    # truncate: keep members 1..3 (3·2/2 = 3 ≤ 3 pairs), drop 4 and 5
    got = {(r.id_a, r.id_b) for r in dedup.simhash_candidates(
        fp, max_pairs_per_clique=3, on_overflow="truncate").collect()}
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_lang_id(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog of the house"),
         (2, "el gato y la casa de los perros que")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang_pred for r in text.lang_id(df).collect()}
    assert got == {1: "en", 2: "es"}


def test_quality_and_tokens(spark):
    df = spark.createDataFrame([(1, "the quick fox. and a dog!")], "doc_id long, text string")
    q = text.quality_score(df).collect()[0]
    assert q.n_tokens == 6
    assert 0 < q.quality <= 1
    t = text.token_counts(df).collect()[0]
    assert t.n_ws_tokens == 6
    assert t.n_tokens_est == 7  # ceil(25/4)


def test_cosine_topk_exact(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    q = emb.filter("vec_id = 0").select(F.col("vec_id").alias("query_id"), "embedding")
    got = [(r.vec_id, r.rank) for r in
           similarity.cosine_topk(emb, q, k=3).orderBy("rank").collect()]
    assert got == [(0, 1), (1, 2), (2, 3)]  # self, near, orthogonal; opposite excluded


def test_ivf_assign_and_topk(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [0.1, 0.9])],
        "vec_id long, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cell_id int, embedding array<float>"
    )
    assigned = similarity.assign_cells(emb, cents)
    cells = {r.vec_id: r.cell_id for r in assigned.collect()}
    assert cells == {0: 0, 1: 0, 2: 1, 3: 1}
    q = emb.filter("vec_id = 0").select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.ivf_topk(assigned, cents, q, k=2, nprobe=1)
    got = [r.vec_id for r in out.orderBy("rank").collect()]
    assert got == [0, 1]  # probed only cell 0


def test_cosine_pairs_blocked_matches_unblocked(spark):
    """Forcing the blocked outer loop (tiny max_broadcast_rows) must yield
    exactly the broadcast-whole-corpus pair set."""
    import random

    from etl_spark.operators import similarity

    random.seed(7)
    rows = [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    whole = similarity.cosine_pairs_fast(df, threshold=0.3)
    blocked = similarity.cosine_pairs_fast(df, threshold=0.3, max_broadcast_rows=17)
    a = {(r.id_a, r.id_b, round(r.sim, 9)) for r in whole.collect()}
    b = {(r.id_a, r.id_b, round(r.sim, 9)) for r in blocked.collect()}
    assert a == b and len(a) > 0


def test_connected_components_chain_and_isolated(spark):
    """A chain (1-2-3), a pair (10-11), and isolated vertices resolve to
    min-id components; convergence needs diameter rounds."""
    from etl_spark.operators.graph import connected_components

    verts = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], "id long")
    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")
    got = {r.id: r.component for r in connected_components(verts, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_driver_path_matches_loop(spark):
    """The bounded driver union-find fast path and the distributed
    min-label loop are the SAME function: identical labels on a graph
    with chains, a clique, and isolated vertices (driver_max_edges=0
    forces the loop)."""
    import random

    from etl_spark.operators.graph import connected_components

    rng = random.Random(13)
    n = 80
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    fast = {r.id: r.component
            for r in connected_components(verts, edf).collect()}
    loop = {r.id: r.component
            for r in connected_components(
                verts, edf, driver_max_edges=0).collect()}
    assert fast == loop and len(fast) == n


def test_jaccard_prefix_join_exact_semantics(spark, docs):
    """The prefix-filtered join returns EXACTLY the pairs with token-set
    Jaccard >= t: identical sets (1,2) at 1.0, the near-dup (1,3)/(2,3)
    at 7/9 (8 distinct tokens each, 7 shared), nothing involving 4; at
    t=1.0 only the identical pair."""
    out = {
        (r.id_a, r.id_b): round(r.jaccard, 6)
        for r in dedup.jaccard_prefix_join(docs, threshold=0.7, emit="pairs").collect()
    }
    assert out[(1, 2)] == 1.0
    assert out[(1, 3)] == out[(2, 3)] == round(7 / 9, 6)
    assert all(4 not in p and 5 not in p for p in out) or (1, 5) not in out
    strict = {
        (r.id_a, r.id_b)
        for r in dedup.jaccard_prefix_join(docs, threshold=1.0, emit="pairs").collect()
    }
    assert strict == {(1, 2)}


def test_jaccard_prefix_join_empty_and_single(spark):
    """Empty-text and singleton inputs don't crash and produce no pairs."""
    d = spark.createDataFrame([(1, ""), (2, "only doc with words")],
                              "doc_id long, text string")
    assert dedup.jaccard_prefix_join(d, threshold=0.5, emit="pairs").count() == 0


def test_minhash_incremental_only_new_pairs(spark, docs):
    """Incremental dedup emits pairs with >= 1 NEW side only; old x old
    (1,3) must be absent even though it passes the threshold."""
    old = docs.filter(F.col("doc_id").isin(1, 3, 4))
    new = docs.filter(F.col("doc_id").isin(2, 5))
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_incremental(old, new, threshold=0.5).collect()
    }
    assert all(a in (2, 5) or b in (2, 5) for a, b in pairs)
    assert (1, 3) not in pairs
    assert (1, 2) in pairs  # new doc 2 deduped against the standing index


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_jaccard_prefix_join_matches_bruteforce_random(spark, seed):
    """Property: on random corpora with a SMALL vocabulary (forcing heavy
    token overlap — the regime where the prefix/positional/length filters
    actually prune), the operator's pair set equals the brute-force
    all-pairs answer exactly. Guards the filter math (prefix length,
    overlap bound, length ratio) against future edits."""
    import itertools
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 10))))
        for i in range(24)
    ]
    t = 0.6
    sets = {i: frozenset(text.split()) for i, text in docs}
    expected = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= t:
            expected.add((a, b))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in dedup.jaccard_prefix_join(df, threshold=t, emit="pairs").collect()
    }
    assert got == expected


@pytest.mark.parametrize("seed", [5, 41])
def test_pq_codes_match_python_mirror(spark, seed):
    """Property: PQ assignment equals a pure-Python mirror that replicates
    the ordered left-fold distance and the (dist, code) argmin tiebreak —
    bit-for-bit, on random integer-valued vectors (exact in double)."""
    import random

    rng = random.Random(seed)
    dim, m, n_cells = 8, 2, 3
    rows = [
        (i, [float(rng.randint(-4, 4)) for _ in range(dim)], i % n_cells)
        for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    # python mirror: per-(cell, pos) mean; per (vec, sub) argmin by
    # (left-fold dist, code)
    by_cell = {}
    for _, v, c in rows:
        by_cell.setdefault(c, []).append(v)
    cents = {
        (c, s): [
            sum(v[s * (dim // m) + j] for v in vs) / len(vs)
            for j in range(dim // m)
        ]
        for c, vs in by_cell.items()
        for s in range(m)
    }

    def fold_dist(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    expected = {}
    for i, v, _ in rows:
        for s in range(m):
            sub = v[s * (dim // m): (s + 1) * (dim // m)]
            best = min(
                (fold_dist(sub, cents[(c, s)]), c) for c in by_cell
            )
            expected[(i, s)] = best[1]

    got_rows, got_m = similarity.pq_assign(emb, m=m)
    got = {(r.vec_id, r.sub): r.code for r in got_rows.collect()}
    assert got == expected and got_m == m


@pytest.mark.parametrize("seed", [3, 17])
def test_simhash_clusters_match_python_mirror(spark, seed):
    """Property: the clique aggregation equals a pure-Python mirror built
    from the operator's own fingerprints — counts, representative,
    bounded preview, intra-pair count, and the brute-force Hamming-<=3
    neighborhood stats over distinct fingerprints."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(10)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 8))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fp = dedup.simhash(df)
    fps = {r.doc_id: r.simhash for r in fp.collect()}

    cliques: dict[int, list[int]] = {}
    for d, s in fps.items():
        cliques.setdefault(s, []).append(d)
    distinct = sorted(cliques)
    expected = {}
    for s in distinct:
        members = sorted(cliques[s])
        nbrs = [o for o in distinct if o != s and bin(o ^ s).count("1") <= 3]
        expected[s] = {
            "n_docs": len(members),
            "intra_pairs": len(members) * (len(members) - 1) // 2,
            "rep_id": members[0],
            "members_preview": ",".join(str(m) for m in members[:5]),
            "n_neighbor_fps": len(nbrs),
            "neighbor_docs": sum(len(cliques[o]) for o in nbrs),
        }

    got = {
        r.simhash: {
            "n_docs": r.n_docs, "intra_pairs": r.intra_pairs,
            "rep_id": r.rep_id, "members_preview": r.members_preview,
            "n_neighbor_fps": r.n_neighbor_fps, "neighbor_docs": r.neighbor_docs,
        }
        for r in dedup.simhash_clusters(fp, max_hamming=3, preview_k=5).collect()
    }
    assert got == expected


@pytest.mark.parametrize("seed", [11, 29])
def test_kmeans_step_matches_python_mirror(spark, seed):
    """Property: the Lloyd step equals a pure-Python mirror (integer
    vectors → exact arithmetic in both paths): per-cell means, ordered
    left-fold squared L2, argmin with (dist, cell) tiebreak."""
    import random

    from etl_spark.operators import similarity

    rng = random.Random(seed)
    dim, n_cells = 6, 3
    rows = [
        (i, [float(rng.randint(-5, 5)) for _ in range(dim)], i % n_cells)
        for i in range(36)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    by_cell: dict[int, list] = {}
    for _, v, c in rows:
        by_cell.setdefault(c, []).append(v)
    cents = {
        c: [sum(v[j] for v in vs) / len(vs) for j in range(dim)]
        for c, vs in by_cell.items()
    }

    def fold(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    expected = {}
    for i, v, prev in rows:
        best = min((fold(v, cents[c]), c) for c in cents)
        expected[i] = (prev, best[1], best[1] != prev)

    got = {
        r.vec_id: (r.cell_prev, r.cell_new, r.moved)
        for r in similarity.kmeans_step(emb).collect()
    }
    assert got == expected


def test_jaccard_default_emits_linear_clusters(spark, docs):
    """SAFE-BY-DEFAULT (r9 verdict item #1): the default output is one
    row per document labeled with the min doc id reachable through >= t
    similarity — the connected components of the pair graph — so k
    identical texts cost k rows, never k^2 pairs."""
    out = dedup.jaccard_prefix_join(docs, threshold=0.7)
    assert set(out.columns) == {"doc_id", "rep_id"}
    got = {r.doc_id: r.rep_id for r in out.collect()}
    # pairs at 0.7: (1,2)=1.0, (1,3)/(2,3)=7/9 -> component {1,2,3};
    # every doc present exactly once, others are singletons
    n_docs = docs.count()
    assert len(got) == n_docs
    assert got[1] == got[2] == got[3] == 1
    assert all(got[d] == d for d in got if d not in (1, 2, 3))


def test_jaccard_pairs_max_pairs_guard(spark, docs):
    """Opt-in pair mode with max_pairs pre-counts the expansion from the
    linear set tables and refuses to materialize an over-cap pair list."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_pairs"):
        dedup.jaccard_prefix_join(
            docs, threshold=0.7, emit="pairs", max_pairs=1
        ).count()
    # a generous cap passes through unchanged
    n = dedup.jaccard_prefix_join(
        docs, threshold=0.7, emit="pairs", max_pairs=1_000_000
    ).count()
    assert n == 3


def test_containment_join_directional_semantics(spark):
    """The case the symmetric pass misses: a short doc embedded in a long
    one (Jaccard small, containment 1.0) — and containment is
    DIRECTIONAL: the long doc is not contained in the short one."""
    small = "alpha beta gamma delta"
    big = small + " " + " ".join(f"extra{i}" for i in range(36))
    df = spark.createDataFrame(
        [(1, small), (2, big), (3, "unrelated tokens only here")],
        "doc_id long, text string",
    )
    out = {(r.id_a, r.id_b): (r.inter, r.n_a, r.containment)
           for r in dedup.containment_prefix_join(df, threshold=0.9).collect()}
    assert set(out) == {(1, 2)}  # small ⊂ big only; never the reverse
    assert out[(1, 2)] == (4, 4, 1.0)
    # sanity: the symmetric exact join at the same threshold sees nothing
    assert dedup.jaccard_prefix_join(df, threshold=0.9, emit="pairs").count() == 0


def test_containment_join_same_set_cliques_both_directions(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "a b c d e")],
        "doc_id long, text string",
    )
    out = {(r.id_a, r.id_b): r.containment
           for r in dedup.containment_prefix_join(df, threshold=0.6).collect()}
    # identical sets: both directions at 1.0; subset: 1↔3 and 2↔3 forward
    # only at t=0.6 (3→1 has containment 3/5 = 0.6, also passes)
    assert out[(1, 2)] == 1.0 and out[(2, 1)] == 1.0
    assert out[(1, 3)] == 1.0 and out[(2, 3)] == 1.0
    assert out[(3, 1)] == pytest.approx(0.6) and out[(3, 2)] == pytest.approx(0.6)


@pytest.mark.parametrize("seed", [7, 23])
def test_containment_join_matches_bruteforce_random(spark, seed):
    """Property twin of the jaccard bruteforce test: small vocabulary,
    heavy overlap — the one-sided prefix + positional filters must be
    pure pruning (identical directional pair set to brute force)."""
    import itertools
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 10))))
        for i in range(24)
    ]
    t = 0.7
    sets = {i: frozenset(text.split()) for i, text in docs}
    expected = set()
    for a, b in itertools.permutations(sorted(sets), 2):
        if sets[a] and len(sets[a] & sets[b]) / len(sets[a]) >= t:
            expected.add((a, b))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.id_a, r.id_b)
           for r in dedup.containment_prefix_join(df, threshold=t).collect()}
    assert got == expected


def test_containment_join_max_pairs_guard(spark):
    df = spark.createDataFrame(
        [(i, "x y z") for i in range(6)], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_pairs"):
        dedup.containment_prefix_join(df, threshold=0.9, max_pairs=10)
    # 6 identical docs → 30 ordered same-set pairs, within a looser cap
    assert dedup.containment_prefix_join(df, threshold=0.9, max_pairs=30).count() == 30


def test_containment_audit_linear_form(spark):
    """emit='audit' (round 13): one row per contained doc; same-set
    exact twins excluded; container count at DOC granularity; best
    container = smallest doc id at the max containment."""
    df = spark.createDataFrame(
        [
            (1, "a b c d"),                # contained in 3 and 4
            (2, "a b c d"),                # exact twin of 1 (excluded pair)
            (3, "a b c d e f"),            # container (set X)
            (4, "a b c d e f"),            # container twin (set X)
            (5, "q r s t u v w x y z"),    # unrelated
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.asDict()
           for r in dedup.containment_prefix_join(
               df, threshold=0.9, emit="audit").collect()}
    # docs 1 and 2 are each contained in the {a..f} set (both members);
    # their same-set twin relationship does NOT appear
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d]["n_a"] == 4
        assert out[d]["n_containers"] == 2      # docs 3 and 4
        assert out[d]["best_containment"] == 1.0
        assert out[d]["container_id"] == 3      # smallest at the max


@pytest.mark.parametrize("seed", [7, 23])
def test_containment_audit_matches_pair_form(spark, seed):
    """The audit is a pure aggregation of the cross-set pair output:
    group the pair form (minus same-set rows) per id_a and compare."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 10))))
        for i in range(24)
    ]
    t = 0.7
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sets = {i: frozenset(text.split()) for i, text in docs}
    pairs = [
        (r.id_a, r.id_b, r.containment)
        for r in dedup.containment_prefix_join(df, threshold=t).collect()
        if sets[r.id_a] != sets[r.id_b]  # audit excludes same-set twins
    ]
    expected = {}
    for a in {p[0] for p in pairs}:
        mine = [(c, b) for (x, b, c) in pairs if x == a]
        best_c = max(c for c, _ in mine)
        expected[a] = (len(mine), round(best_c, 6),
                       min(b for c, b in mine if c == best_c))
    got = {r.doc_id: (r.n_containers, r.best_containment, r.container_id)
           for r in dedup.containment_prefix_join(
               df, threshold=t, emit="audit").collect()}
    assert got == expected


def test_ann_dim_guard_raises_in_plan(spark):
    """The declared-dim guard (which replaced the per-call len(head())
    driver probe) still fails LOUDLY when the embedding length drifts from
    the dim the planes/codebooks were built for — now at execution time,
    inside the scan, via raise_error."""
    from py4j.protocol import Py4JJavaError

    emb = spark.createDataFrame(
        [(i, [float(i), float(i + 1)], 0) for i in range(4)],
        "vec_id long, embedding array<double>, label int",
    )
    q = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(Exception) as ei:
        similarity.lsh_topk(emb, q, k=2, n_bits=3, dim=64).collect()
    assert "embedding dim" in str(ei.value)
    with pytest.raises(Exception) as ei2:
        similarity.pq_codes(emb, m=4, dim=64).collect()
    assert "embedding dim" in str(ei2.value)
    # matching dim passes (guard is free on healthy data)
    ok = similarity.pq_codes(emb, m=2, dim=2)
    assert ok.count() == 4
