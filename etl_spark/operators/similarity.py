"""Similarity search over embedding columns (``array<float>``).

Two paths, as a production ANN stack would have:

- :func:`cosine_topk` — exact brute-force top-k. The baseline and the
  verify oracle for everything approximate. Cross join is explicit and the
  small side (the query set) is broadcast: cost = |queries| × |corpus| dot
  products, all inside codegen via ``F.aggregate``/``zip_with`` — no Python.
- :func:`ivf_topk` — IVF-style approximate search: k-means-ish coarse
  centroids (here: per-label mean vectors, deterministic), probe the
  ``nprobe`` nearest cells, exact search inside probed cells only. At
  100 TB the corpus is hash-partitioned by cell id so a probe touches only
  matching partitions; the centroid table is broadcast.

Plus the compression tier a 100 TB vector corpus needs:
:func:`pq_codes` (product-quantization encode, 64 float32 → 4 bytes) and
:func:`pq_adc_topk` (asymmetric-distance search over the codes — raw
vectors never read at search time).

Embedding near-duplicate detection = :func:`cosine_pairs` with a high
threshold (the embedding-cosine variant of the dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _vec_expr(vec_col: str, dim: int | None) -> str:
    """SQL fragment casting ``vec_col`` to array<double>, with an optional
    IN-PLAN dim guard: when ``dim`` is given, a drifted array length raises
    loudly inside the scan (USER_RAISED_EXCEPTION) instead of silently
    null-padding ``zip_with``. Replaces the old ``len(head())`` driver
    probe, which cost one Spark job per operator call (guide §1.2/§7.3)."""
    base = f"cast({vec_col} as array<double>)"
    if dim is None:
        return base
    return (
        f"CASE WHEN size({vec_col}) = {dim} THEN {base} "
        f"ELSE raise_error(concat('embedding dim ', size({vec_col}), "
        f"' != {dim}: regenerate the codebooks/planes for this table')) END"
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    """Cosine similarity of two array<float/double> columns — pure Column
    algebra (F.zip_with/F.aggregate), runs JVM-side.

    Inputs are widened to double BEFORE any product: fp32 intermediate
    products lose ~1e-7 per term, which both hurts ranking quality and
    breaks bit-parity with the (double-precision) oracle.
    """
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine: ``(query_id, vec_id, sim, rank)``.

    The query side is broadcast (small by contract); ranking is the
    standard top-k window with a deterministic ``vec_id`` tiebreak. The
    corpus is scanned once, never shuffled — the only exchange is the
    per-query rank, keyed by query_id (|queries| partitions).
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    corpus = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col("__qvec")).alias("sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: ``(id_a, id_b, sim)`` with
    ``sim >= threshold``.

    Without ``block_col`` this is an explicit O(n²/2) self-join — correct
    but only for small/medium corpora (the oracle path). With ``block_col``
    (e.g. an IVF cell or LSH bucket) the join is equi on the block — the
    scalable path, same contract as :func:`ivf_topk` cells.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                  *([F.col(block_col).alias("__blk")] if block_col else []))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                  *([F.col(block_col).alias("__blk")] if block_col else []))
    if block_col:
        joined = a.join(b, ["__blk"])
    else:
        # stream side spread across the cluster, build side broadcast —
        # parallel BroadcastNestedLoopJoin instead of a cartesian shuffle
        n = df.sparkSession.sparkContext.defaultParallelism
        joined = a.repartition(n).crossJoin(F.broadcast(b))
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def cosine_pairs_fast(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    prune_margin: float = 1e-6,
    max_broadcast_rows: int = 2_000_000,
) -> DataFrame:
    """Near-dup pairs via blocked-GEMM candidate pruning + exact verify.

    Two-stage, mirroring the minhash→verify shape:

    1. **Prune** (Arrow/numpy): the corpus matrix is broadcast (unit-
       normalized float64); ``mapInPandas`` computes each partition-block ×
       matrix product with BLAS and keeps pairs with
       ``sim >= threshold - prune_margin``. ~1000× the throughput of
       per-pair expression evaluation; the margin covers BLAS-vs-fold
       float discrepancy (≈1e-13) with 7 orders of magnitude to spare.
    2. **Verify** (JVM): exact left-fold cosine on the surviving pairs —
       bit-identical to the brute-force/oracle formula, so downstream
       consumers see exactly the :func:`cosine_pairs` contract.

    When the corpus exceeds ``max_broadcast_rows`` the broadcast side
    becomes an outer loop over id-range blocks (each block broadcast in
    turn, every partition × block GEMM still covers all pairs exactly
    once via the ``id_a < id_b`` cut) — the 100 TB path; the per-block
    kernel is unchanged. An IVF cell restriction composes on top when
    even one block pass is too much.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    n_rows = df.count()
    if n_rows > max_broadcast_rows:
        return _cosine_pairs_blocked(
            df, id_col, vec_col, threshold, prune_margin, max_broadcast_rows
        )
    rows = df.select(F.col(id_col), F.col(vec_col)).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    cut = threshold - prune_margin

    def prune(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        index_of = {v: i for i, v in enumerate(all_ids)}
        for pdf in batches:
            idx = pdf[id_col].map(index_of).to_numpy()
            block = all_mat[idx]                      # rows of this partition
            sims = block @ all_mat.T                  # BLAS
            for r, my_id in enumerate(pdf[id_col].to_numpy()):
                hits = np.nonzero((sims[r] >= cut) & (all_ids > my_id))[0]
                if len(hits):
                    yield pd.DataFrame({"id_a": my_id, "id_b": all_ids[hits]})

    # ≥512 rows per prune task: below that, Python-worker spin-up dominates
    # the GEMM. At cluster scale len(rows)//512 >> parallelism so this is
    # simply the cluster width.
    n = max(1, min(spark.sparkContext.defaultParallelism, len(rows) // 512))
    cands = df.select(id_col).repartition(n).mapInPandas(prune, schema="id_a long, id_b long")
    vecs = df.select(F.col(id_col), F.col(vec_col))
    joined = (
        cands.join(F.broadcast(vecs.withColumnRenamed(id_col, "id_a").withColumnRenamed(vec_col, "va")), "id_a")
        .join(F.broadcast(vecs.withColumnRenamed(id_col, "id_b").withColumnRenamed(vec_col, "vb")), "id_b")
    )
    return (
        joined.select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def _cosine_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    prune_margin: float,
    block_rows: int,
) -> DataFrame:
    """Outer loop for corpora too large to broadcast whole: split the
    BROADCAST side into id-sorted blocks of ``block_rows`` and run the
    standard prune kernel once per block against the full distributed
    corpus. Union of block results = exact pair set (each pair lands in
    exactly the block holding its larger id — the ``id_a < id_b`` cut
    inside the kernel dedups across blocks).

    Cost: ``ceil(n / block_rows)`` passes over the corpus — the classic
    blocked all-pairs trade (GEMM tiling at cluster granularity). Each
    pass is embarrassingly parallel and spill-free.

    Block boundaries come from ``approxQuantile`` — driver memory is
    bounded by ``n_blocks - 1`` doubles, never a corpus-wide id collect.
    Boundaries need not be exact: the ``build.id > probe.id`` cut inside
    the kernel already assigns each pair to exactly one block, so
    approximate splits only skew block sizes slightly, never correctness.
    """
    import math

    n_rows = df.count()
    n_blocks = max(1, math.ceil(n_rows / block_rows))
    cuts: list[int] = []
    if n_blocks > 1:
        probs = [i / n_blocks for i in range(1, n_blocks)]
        # ids are longs < 2^53 so the float round-trip is exact
        cuts = [int(q) for q in df.approxQuantile(id_col, probs, 0.001)]
    bounds = [None, *cuts, None]  # half-open (lo, hi] ranges over id space
    out = None
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        cond = F.lit(True)
        if lo is not None:
            cond = F.col(id_col) > lo
        if hi is not None:
            cond = cond & (F.col(id_col) <= hi)
        block = df.filter(cond)
        if block.isEmpty():  # duplicate quantile cut under skew
            continue
        part = _cosine_pairs_kernel(
            probe=df, build=block, id_col=id_col, vec_col=vec_col,
            threshold=threshold, prune_margin=prune_margin,
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        return df.sparkSession.createDataFrame([], "id_a long, id_b long, sim double")
    return out


def _cosine_pairs_kernel(
    probe: DataFrame,
    build: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    prune_margin: float,
) -> DataFrame:
    """One prune+verify pass: ``build`` (collected + broadcast, unit-
    normalized) × ``probe`` (distributed). Emits pairs with
    ``probe.id < build.id`` only, so block unions never double-count."""
    import numpy as np
    import pandas as pd

    spark = probe.sparkSession
    rows = build.select(F.col(id_col), F.col(vec_col)).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    cut = threshold - prune_margin

    def prune(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            pvecs = np.array(list(pdf[vec_col]), dtype=np.float64)
            pvecs = pvecs / np.linalg.norm(pvecs, axis=1, keepdims=True)
            sims = pvecs @ all_mat.T
            for r, my_id in enumerate(pdf[id_col].to_numpy()):
                hits = np.nonzero((sims[r] >= cut) & (all_ids > my_id))[0]
                if len(hits):
                    yield pd.DataFrame({"id_a": my_id, "id_b": all_ids[hits]})

    n = max(1, spark.sparkContext.defaultParallelism)
    cands = (
        probe.select(F.col(id_col), F.col(vec_col))
        .repartition(n)
        .mapInPandas(prune, schema="id_a long, id_b long")
    )
    # verify joins: the CANDIDATE side broadcasts (near-dup candidate sets
    # are tiny vs the corpus); the corpus is scanned, never shuffled —
    # opposite of the small-corpus path, where the corpus broadcasts
    va = probe.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = probe.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    joined = cands.hint("broadcast").join(va, "id_a").hint("broadcast").join(vb, "id_b")
    return (
        joined.select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    cell_col: str = "cell_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).

    ``centroids``: (cell_id, centroid array<double>) — broadcast; the
    argmax over cells happens inside one codegen stage per corpus row.
    Persist the result partitioned by cell for repeated queries.
    """
    cents = centroids.select(
        F.col(cell_col).alias("__cid"), F.col(vec_col).alias("__cvec")
    )
    scored = corpus.crossJoin(F.broadcast(cents)).withColumn(
        "__csim", cosine(F.col(vec_col), F.col("__cvec"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*corpus.columns[:1]).orderBy(F.col("__csim").desc(), F.col("__cid").asc())
    # partition key = the corpus id column (first column by convention)
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__cvec", "__csim")
        .withColumnRenamed("__cid", cell_col)
    )


def ivf_topk(
    corpus_with_cells: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    cell_col: str = "cell_id",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` closest cells per query,
    exact-search only those cells.

    Recall/latency knob = nprobe (as in FAISS IVF). The probed-cell join is
    equi on ``cell_col``; with the corpus bucketed by cell this reads only
    matching buckets — the 100 TB-shaped plan.
    """
    cents = centroids.select(
        F.col(cell_col), F.col(vec_col).alias("__cvec")
    )
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
    from pyspark.sql import Window

    probe_w = Window.partitionBy(query_id_col).orderBy(F.col("__psim").desc(), F.col(cell_col).asc())
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("__psim", cosine(F.col("__qvec"), F.col("__cvec")))
        .withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= nprobe)
        .select(query_id_col, cell_col, "__qvec")
    )
    scored = corpus_with_cells.join(F.broadcast(probes), [cell_col]).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col("__qvec")).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Sign-LSH (random hyperplane) bucketed ANN
# ---------------------------------------------------------------------------

def lsh_sign_matrix(n_bits: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix (Charikar random-hyperplane LSH
    with Rademacher projections). Seeded from md5 so both engines and every
    run see the same planes — no RNG state to ship."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16) >= 8 else -1
            for i in range(dim)
        ]
        for j in range(n_bits)
    ]


def lsh_bucket(vec_col: str, n_bits: int = 6, dim: int = 64,
               check_dim: bool = False):
    """Bucket id = n-bit sign signature of the vector under the fixed
    hyperplanes — built as ONE SQL string (a single parse) instead of the
    Column-API form whose ~400 py4j literal/lambda round trips cost real
    driver time per plan construction (guide §7.3; same move as the
    simhash SQL strings). Semantics identical term-for-term; bucketing
    still happens in the scan stage. ``check_dim`` adds the in-plan loud
    dim guard (see :func:`_vec_expr`)."""
    signs = lsh_sign_matrix(n_bits, dim)
    v = _vec_expr(vec_col, dim if check_dim else None)
    terms = []
    for j, row in enumerate(signs):
        plane = "array(" + ",".join(f"{float(s)}D" for s in row) + ")"
        proj = (
            f"aggregate(zip_with({v}, {plane}, (x, y) -> x * y), "
            f"0.0D, (a, b) -> a + b)"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END)")
    return F.expr(" + ".join(terms))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    n_bits: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k restricted to the query's LSH bucket.

    Scale shape vs brute force: the corpus join key is the bucket id, so
    per-query work is bucket occupancy (n / 2^bits expected), not n. The
    corpus side never broadcasts; the (tiny) query side does. Recall is
    the usual S-curve tradeoff — RAISE n_bits for bigger corpora, or
    multi-probe by unioning bit-flipped query buckets. Deterministic
    hyperplanes ⇒ deterministic result ⇒ exact SQL oracle.
    """
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("__cv"),
        lsh_bucket(vec_col, n_bits, dim, check_dim=True).alias("__bkt"),
    )
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qv"),
        lsh_bucket(vec_col, n_bits, dim, check_dim=True).alias("__bkt"),
    )
    scored = c.join(F.broadcast(q), "__bkt").select(
        F.col(query_id_col), F.col(id_col), cosine(F.col("__cv"), F.col("__qv")).alias("sim")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _component_means(emb: DataFrame, vec_col: str, cell_col: str) -> DataFrame:
    """Per-(cell, component) corpus means ``(__cell, pos, c)`` — the ONE
    corpus-sized aggregation every centroid consumer (sub-codebooks,
    coarse IVF centroids, k-means) derives from.

    Means accumulate through DECIMAL(38,15): decimal addition is EXACT,
    so the sum — and therefore the argmin assignment downstream — is
    independent of Spark's partition/accumulation order (a plain double
    ``avg`` is not: float addition is order-dependent, and near-tie
    assignments could flip between runs or diverge from the oracle).
    The one deterministic rounding is the per-value double→decimal cast;
    for values with ≤15 fractional decimal digits (all integer-valued and
    2^-k-quantized fixtures, k ≤ 15·log2(10)) it is exact in both engines.
    """
    ev = F.col(vec_col).cast("array<double>")
    comp = emb.select(F.col(cell_col).alias("__cell"), F.posexplode(ev).alias("pos", "v"))
    return comp.groupBy("__cell", "pos").agg(
        (
            F.sum(F.col("v").cast("decimal(38,15)")).cast("double") / F.count("v")
        ).alias("c")
    )


def _pq_centroids(
    emb: DataFrame | None, vec_col: str, cell_col: str, s: int,
    means: DataFrame | None = None,
) -> DataFrame:
    """Per-(cell, subspace) centroid arrays, components ordered by
    position — derived from :func:`_component_means`. Pass ``means`` (a
    possibly-materialized component-mean table) to reuse one corpus
    aggregation across the assign/LUT/coarse consumers that previously
    each re-ran it (self-referenced subplans are not shared — guide §2.4).
    """
    if means is None:
        means = _component_means(emb, vec_col, cell_col)
    return (
        means.withColumn("sub", (F.col("pos") / s).cast("int"))
        .groupBy("__cell", "sub")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda x: x["c"]
            ).alias("cvec")
        )
    )


def _pq_subvectors(
    df: DataFrame, id_col: str, vec_col: str, m: int, s: int,
    dim: int | None = None,
) -> DataFrame:
    """Explode each vector into ``m`` (id, sub, svec) subvector rows —
    scan-stage slice, no shuffle. ``dim`` adds the in-plan loud length
    guard (see :func:`_vec_expr`)."""
    ev = F.expr(_vec_expr(vec_col, dim))
    return df.select(F.col(id_col), ev.alias("__ev")).select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("sub"), F.slice("__ev", i * s + 1, s).alias("svec")
                    )
                    for i in range(m)
                ]
            )
        ).alias("x"),
    ).select(id_col, F.col("x.sub").alias("sub"), F.col("x.svec").alias("svec"))


def _sq_l2(a: str, b: str):
    """Ordered-fold squared L2 between two array columns — bit-matches the
    oracle's ``list_reduce`` left fold. One SQL string (single parse)
    instead of two Column-API lambda constructions per call site."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def pq_assign(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    m: int = 4,
    dim: int | None = None,
    cents: DataFrame | None = None,
) -> tuple[DataFrame, int]:
    """Long-form PQ assignment: ``(id, sub, code, dist)`` — one row per
    vector × subspace with the argmin codebook entry (ties by code asc).
    Returns ``(DataFrame, m)``. Pass ``dim`` to skip the ``len(head())``
    driver job (the guard moves in-plan) and ``cents`` to reuse a shared
    codebook table."""
    if dim is None:
        dim = len(emb.select(vec_col).head()[0])
        guard = None  # dim measured from the data — nothing to drift from
    else:
        guard = dim
    s = dim // m
    if cents is None:
        cents = _pq_centroids(emb, vec_col, cell_col, s)
    subs = _pq_subvectors(emb, id_col, vec_col, m, s, dim=guard)
    scored = subs.join(F.broadcast(cents), "sub").select(
        id_col, "sub", F.col("__cell").alias("code"), _sq_l2("svec", "cvec").alias("dist")
    )
    best = (
        scored.groupBy(id_col, "sub")
        .agg(F.min(F.struct(F.col("dist"), F.col("code"))).alias("b"))
        .select(id_col, "sub", F.col("b.code").alias("code"), F.col("b.dist").alias("dist"))
    )
    return best, m


def pq_codes(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    m: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Product-quantization encoding — the vector-compression step of
    IVF-PQ (Jégou et al. '11): split each D-dim vector into ``m``
    subvectors, train one codebook per subspace, store each vector as
    ``m`` one-byte codes. At 100 TB vector scale this is what makes the
    index FIT (64 float32 → 4 bytes here); search then scans codes with
    per-subspace lookup tables.

    Codebook "training" is one deterministic assignment step: per-subspace
    centroids are the component means of the existing cell partition
    (``cell_col``, same reuse as :func:`ivf_topk`'s centroids) — a full
    k-means adds iterations of exactly this assign+mean pair. Float
    policy: components widen to double before any arithmetic; centroid
    means are exact (float32 sums fit double mantissa), distances fold in
    array order (``F.aggregate`` ≡ the oracle's ``list_reduce``), argmin
    breaks ties by code ascending — bit-deterministic cross-engine, no
    rounding needed before the argmin.

    Plan: centroid build = two map-combined aggs over the exploded
    components (codebook-sized output); assignment = scan-stage slice +
    broadcast join of ``m × n_cells`` codebook rows + one min-struct agg
    keyed on (id, subspace) + one wide agg on id. Vectors are never
    self-joined.

    Returns ``(id, code_0..code_{m-1}, recon_err)``.
    """
    best, m = pq_assign(emb, id_col, vec_col, cell_col, m, dim=dim)
    code_cols = [
        F.max(F.when(F.col("sub") == i, F.col("code"))).alias(f"code_{i}")
        for i in range(m)
    ]
    dist_cols = [
        F.max(F.when(F.col("sub") == i, F.col("dist"))).alias(f"__d{i}")
        for i in range(m)
    ]
    wide = best.groupBy(id_col).agg(*code_cols, *dist_cols)
    err = F.col("__d0")
    for i in range(1, m):
        err = err + F.col(f"__d{i}")
    return wide.select(
        id_col, *[f"code_{i}" for i in range(m)], F.round(err, 6).alias("recon_err")
    )


def pq_adc_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    query_id_col: str = "query_id",
    m: int = 4,
    k: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes — the search half of
    IVF-PQ: the corpus is scanned as ``m`` one-byte codes per vector, and
    each query's distances come from a tiny lookup table (query subvector
    → every codebook entry) instead of touching raw vectors.

    Plan shape at 100 TB: the code table (4 bytes/vector) is the ONLY
    corpus-sized input; the LUT (queries × m × n_cells rows) broadcasts;
    the per-(query, vector) approximate distance assembles via one
    grouped aggregation with fixed-order subspace addition, then a
    WindowGroupLimit-prunable top-k. Raw embeddings are read once at
    encode time, never at search time.

    Exactness note: "approximate" refers to PQ quantization error vs true
    distances; the computation itself is bit-deterministic (ordered
    folds, fixed-order adds, id tiebreaks) — hence an exact SQL oracle.
    """
    if dim is None:
        dim = len(emb.select(vec_col).head()[0])
        guard = None
    else:
        guard = dim
    s = dim // m
    # ONE corpus component-mean aggregation, materialized (codebook-sized:
    # |cells| × dim rows): the assign path and the query LUT previously
    # each re-ran the corpus posexplode agg (self-referenced subplans are
    # not shared — guide §2.4). Both now derive from this table.
    means = _component_means(emb, vec_col, cell_col).localCheckpoint(eager=True)
    cents = _pq_centroids(None, vec_col, cell_col, s, means=means)
    codes, _ = pq_assign(emb, id_col, vec_col, cell_col, m, dim=dim, cents=cents)
    qsubs = _pq_subvectors(queries, query_id_col, vec_col, m, s, dim=guard)
    lut = qsubs.join(F.broadcast(cents), "sub").select(
        query_id_col,
        "sub",
        F.col("__cell").alias("code"),
        _sq_l2("svec", "cvec").alias("qdist"),
    )
    scored = codes.select(id_col, "sub", "code").join(
        F.broadcast(lut), ["sub", "code"]
    )
    dist_cols = [
        F.max(F.when(F.col("sub") == i, F.col("qdist"))).alias(f"__d{i}")
        for i in range(m)
    ]
    wide = scored.groupBy(query_id_col, id_col).agg(*dist_cols)
    adist = F.col("__d0")
    for i in range(1, m):
        adist = adist + F.col(f"__d{i}")
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adist").asc(), F.col(id_col).asc()
    )
    return (
        wide.select(query_id_col, id_col, adist.alias("adist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("adist", 6).alias("adist"), "rank")
    )


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    query_id_col: str = "query_id",
    m: int = 4,
    k: int = 5,
    nprobe: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """Full IVF-PQ search: coarse-quantize queries to their ``nprobe``
    nearest cells (full-vector centroids, squared L2), then run the ADC
    code scan ONLY over vectors in probed cells — the composition FAISS
    ships as IndexIVFPQ, and the 100 TB shape: with the code table
    hash-partitioned by cell, a probe touches nprobe/n_cells of the
    corpus, each vector costing 4 code-byte LUT lookups.

    Both stages bit-deterministic (ordered folds, fixed-order adds, id
    tiebreaks) → exact SQL oracle, like :func:`pq_adc_topk`.
    """
    if dim is None:
        dim = len(emb.select(vec_col).head()[0])
        guard = None
    else:
        guard = dim
    s = dim // m
    # ONE corpus component-mean aggregation, materialized and shared by
    # all three centroid consumers (coarse IVF centroids, the assign
    # codebooks, the query LUT) — previously each re-ran the corpus
    # posexplode agg (self-referenced subplans are not shared, guide §2.4).
    means = _component_means(emb, vec_col, cell_col).localCheckpoint(eager=True)
    # coarse centroids: full-vector per-cell means (ordered assembly).
    # Same DECIMAL(38,15) accumulation as _pq_centroids: probe selection
    # is discrete (cell ids), so the mean must be order-independent
    coarse = (
        means.groupBy("__cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda x: x["c"]
            ).alias("cvec")
        )
    )
    q = queries.select(F.col(query_id_col), F.expr(_vec_expr(vec_col, guard)).alias("qv"))
    from pyspark.sql import Window

    pw = Window.partitionBy(query_id_col).orderBy(
        F.col("__pdist").asc(), F.col("__cell").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(coarse))
        .withColumn("__pdist", _sq_l2("qv", "cvec"))
        .withColumn("__pr", F.row_number().over(pw))
        .filter(F.col("__pr") <= nprobe)
        .select(query_id_col, F.col("__cell").alias("cell"))
    )
    cents = _pq_centroids(None, vec_col, cell_col, s, means=means)
    codes, _ = pq_assign(emb, id_col, vec_col, cell_col, m, dim=dim, cents=cents)
    cellmap = emb.select(F.col(id_col), F.col(cell_col).alias("cell"))
    qsubs = _pq_subvectors(queries, query_id_col, vec_col, m, s, dim=guard)
    lut = qsubs.join(F.broadcast(cents), "sub").select(
        query_id_col,
        "sub",
        F.col("__cell").alias("code"),
        _sq_l2("svec", "cvec").alias("qdist"),
    )
    scored = (
        codes.select(id_col, "sub", "code")
        .join(cellmap, id_col)
        .join(F.broadcast(probes), "cell")
        .join(F.broadcast(lut), [query_id_col, "sub", "code"])
    )
    dist_cols = [
        F.max(F.when(F.col("sub") == i, F.col("qdist"))).alias(f"__d{i}")
        for i in range(m)
    ]
    wide = scored.groupBy(query_id_col, id_col).agg(*dist_cols)
    adist = F.col("__d0")
    for i in range(1, m):
        adist = adist + F.col(f"__d{i}")
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adist").asc(), F.col(id_col).asc()
    )
    return (
        wide.select(query_id_col, id_col, adist.alias("adist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("adist", 6).alias("adist"), "rank")
    )


def kmeans_step(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """One Lloyd iteration of k-means over the embedding corpus — the
    assign-to-nearest-mean step that IVF/PQ codebook training repeats to
    convergence (the representative ITERATIVE algorithm of the vector
    stack; a full training loop is this operator driven by an external
    for-loop, each pass reading the previous assignment column).

    Centroids are the current partition's per-cell component means
    (DECIMAL(38,15) sums — order-independent, see :func:`_pq_centroids`),
    assignment is argmin squared-L2 over an ordered fold with ties broken
    by cell ascending — bit-deterministic, exact SQL oracle.

    Scale shape: centroid build is two map-combined aggs with
    codebook-sized output; assignment is one broadcast of |cells|
    centroids against a scan of the corpus — no shuffle of vectors, no
    pairwise join. Returns ``(id, cell_prev, cell_new, dist, moved)``;
    ``moved`` counts drive the convergence check.
    """
    from pyspark.sql import Window

    ev = F.col(vec_col).cast("array<double>")
    cents = (
        _component_means(emb, vec_col, cell_col)
        .groupBy("__cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda x: x["c"]
            ).alias("cvec")
        )
    )
    vecs = emb.select(
        F.col(id_col), F.col(cell_col).alias("cell_prev"), ev.alias("__v")
    )
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        id_col,
        "cell_prev",
        F.col("__cell").alias("cell"),
        _sq_l2("__v", "cvec").alias("dist"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("dist").asc(), F.col("cell").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            "cell_prev",
            F.col("cell").alias("cell_new"),
            F.round("dist", 6).alias("dist"),
            (F.col("cell_prev") != F.col("cell")).alias("moved"),
        )
    )


def ivfpq_rerank(
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    query_id_col: str = "query_id",
    m: int = 4,
    k: int = 5,
    k_cand: int = 20,
    nprobe: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """IVF-PQ search with EXACT re-ranking (the FAISS ``IndexRefineFlat``
    pattern): the compressed index proposes ``k_cand`` candidates per
    query via ADC over 4-byte codes, then ONLY those candidates' raw
    vectors are fetched and re-scored with true squared L2 — quantization
    error is corrected at the cost of |queries| × k_cand raw-vector
    reads, not a corpus scan.

    Scale shape: stage 1 is :func:`ivfpq_topk` (codes-only, probed cells
    only); stage 2 joins the candidate list (queries × k_cand rows —
    broadcast) against the raw-embedding table on vec_id, so the heavy
    table is touched via an equi-join that prunes to candidate rows.
    Deterministic folds + id tiebreaks → exact SQL oracle.
    """
    from pyspark.sql import Window

    cand = ivfpq_topk(
        emb, queries, id_col, vec_col, cell_col, query_id_col,
        m=m, k=k_cand, nprobe=nprobe, dim=dim,
    ).select(query_id_col, id_col)
    ev = F.col(vec_col).cast("array<double>")
    qv = queries.select(F.col(query_id_col), ev.alias("__qv"))
    cv = emb.select(F.col(id_col), ev.alias("__cv"))
    scored = (
        cand.join(F.broadcast(qv), query_id_col)
        .join(cv, id_col)
        .select(query_id_col, id_col, _sq_l2("__cv", "__qv").alias("dist"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("dist", 6).alias("dist"), "rank")
    )
