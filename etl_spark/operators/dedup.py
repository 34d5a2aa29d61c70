"""Deduplication operators for training-data pipelines at 100 TB scale.

Five strategies, cheapest first:

1. :func:`exact_duplicates` — hash-groupBy on a content fingerprint. One
   shuffle on the hash; map-side partial aggregation makes the reduce side
   proportional to the number of distinct documents, not rows.
2. :func:`minhash_lsh` — shingle → MinHash signature → banded LSH →
   bucket self-join → exact Jaccard verify on candidates only. The classic
   near-dup pipeline (Broder '97 resemblance sketches; LSH banding per
   Mining of Massive Datasets ch.3). Never computes the O(n²) pairset:
   the only join is on (band, band_hash) buckets.
3. :func:`simhash` + :func:`simhash_candidates` — Charikar '02 random
   hyperplane sketch; near-dups = small Hamming distance. Candidate
   generation via the pigeonhole byte-block trick (distance ≤ k ⟹ some
   block of the fingerprint is equal) so the join is equi, not theta.
4. :func:`ngram_jaccard` — exact n-gram Jaccard for a given candidate
   pair set (the verify stage, reusable standalone).
5. embedding near-dup — cosine over an embedding column; see
   :mod:`etl_spark.operators.similarity`.

All hashing is md5-based (deterministic, engine-portable — the DuckDB
oracle mirrors every stage bit-for-bit). Production tuning notes are on
each function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.operators.text import tokens


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", normalized: bool = True
) -> DataFrame:
    """Exact-duplicate groups by content hash.

    Returns one row per fingerprint: ``(fingerprint, n_docs, min_doc_id,
    max_doc_id)``. Keep-first policy = keep ``min_doc_id``. Single shuffle
    on the hash — at 100 TB this is the cheapest full-corpus dedup and the
    standard first pass before any near-dup method.
    """
    c = F.col(text_col)
    fp = F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")) if normalized else F.md5(c)
    return (
        df.select(F.col(id_col), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("min_doc_id"),
            F.max(id_col).alias("max_doc_id"),
        )
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """Distinct k-word shingles per document: ``(id, shingle)``.

    Word shingles (not char) keep the row explosion bounded by token count.
    The explode happens in the scan stage — no shuffle until the consumer
    aggregates.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    idxs = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(F.array())
    sh = F.transform(idxs, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    return df.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 16
) -> DataFrame:
    """MinHash signature per document, wide: ``(id, h0..h{n-1})``.

    Hash family: ``md5(seed || ':' || shingle)`` — the min over a doc's
    shingle set of each seeded hash estimates resemblance (Broder '97).
    Shape: the ``num_hashes`` seeded hashes are parallel COLUMNS, not an
    exploded seed dimension — the input never grows, a single groupBy(id)
    computes all mins, and map-side combine collapses each partition to
    one row per doc before the only exchange. (The exploded form shuffles
    ``num_hashes ×`` the shingle count; this shuffles ``1/shingle_count``
    of it.)
    """
    # one parsed SQL string per agg (vs ~6 py4j calls each — guide §7.3)
    aggs = [
        F.expr(f"min(md5(concat_ws(':', '{s}', shingle))) AS h{s}")
        for s in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_buckets(
    sig: DataFrame, id_col: str = "doc_id", bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Band the wide signature: ``(id, band, band_hash)``.

    band_hash = md5 of the band's minhashes joined in seed order. Two docs
    collide in a band iff that slice of their signatures is identical —
    P[collide] = s^rows per band for similarity s (MMDS ch.3 S-curve).
    Banding is pure projection over the wide signature row (zero shuffle);
    the row count only multiplies by ``bands`` here, after the per-doc
    collapse.
    """
    band_cols = [
        F.md5(
            F.concat_ws(",", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)])
        ).alias(f"bh{b}")
        for b in range(bands)
    ]
    wide = sig.select(F.col(id_col), *band_cols)
    pairs = F.array(
        *[F.struct(F.lit(b).alias("band"), F.col(f"bh{b}").alias("band_hash")) for b in range(bands)]
    )
    return wide.select(
        F.col(id_col), F.explode(pairs).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))


def candidate_pairs(buckets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct candidate pairs from LSH buckets: ``(id_a, id_b)``,
    ``id_a < id_b``.

    Self-equi-join on (band, band_hash) — the whole point of LSH: the join
    key is the bucket, so cost scales with bucket occupancy, not n². Skewed
    buckets (boilerplate docs) are exactly what AQE skew-join splitting
    handles; for pathological cases cap bucket size upstream.
    """
    a = buckets.select(F.col("band"), F.col("band_hash"), F.col(id_col).alias("id_a"))
    b = buckets.select(F.col("band"), F.col("band_hash"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def shingle_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Per-document shingle sets: ``(id, sh_set, hset)`` — the distinct
    shingle strings and their xxhash64 longs as parallel arrays.

    One tokenize scan + one map-combined ``collect_set`` shuffle produce
    the table every MinHash stage needs: signatures are array-mins over
    ``sh_set`` (zero further shuffles), verify intersects ``hset`` (long
    compares, ~2× faster than strings — the same digest policy as the
    prefix-join family; |A∩B| over an injective hash equals |A∩B| over
    shingles).
    """
    return (
        shingles(df, id_col, text_col, k)
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("sh_set"))
        .withColumn("hset", F.transform("sh_set", lambda x: F.xxhash64(x)))
    )


def minhash_signatures_from_sets(
    sets_: DataFrame, id_col: str = "doc_id", num_hashes: int = 16
) -> DataFrame:
    """MinHash signature computed per ROW from the shingle-set array:
    ``min(md5(seed || ':' || shingle))`` over ``sh_set`` — identical to
    :func:`minhash_signatures` (min over a set equals min over its
    exploded rows) but with NO shuffle: the seeded mins are array
    transforms in the scan stage of the set table.
    """
    # SQL-string form (one selectExpr) — the Column-API lambda chain cost
    # ~0.4 s of py4j round trips per call in plan construction alone
    return sets_.selectExpr(
        id_col,
        *[
            f"array_min(transform(sh_set, "
            f"x -> md5(concat_ws(':', '{s}', x)))) AS h{s}"
            for s in range(num_hashes)
        ],
    )


def ngram_jaccard(
    pairs: DataFrame,
    sh: DataFrame | None,
    id_col: str = "doc_id",
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard for candidate pairs: ``(id_a, id_b, inter, union_, jaccard)``.

    Joins each side's distinct shingle-hash set onto the pairs and
    computes |A∩B| / |A∪B| with JVM array intrinsics over xxhash64 longs
    (injective within a pair w.h.p. — counts equal the string-set counts;
    the long intersect is ~2× faster than strings, same digest policy as
    the prefix-join family). Pass ``sets`` (a :func:`shingle_sets` table,
    possibly materialized) to reuse an existing collapse; otherwise it is
    built from the exploded ``sh``. Neither join is hinted: the pairs
    side is usually tiny (LSH output) but grows with real duplication,
    and the set table carries corpus-sized array payloads — AQE's runtime
    sizes pick the build side safely at every scale.
    """
    if sets is None:
        sets = sh.groupBy(id_col).agg(
            F.collect_set(F.xxhash64("shingle")).alias("hset")
        )
    sets_ = sets.select(F.col(id_col), F.col("hset"))
    j = (
        pairs.join(sets_.withColumnRenamed(id_col, "id_a").withColumnRenamed("hset", "set_a"), "id_a")
        .join(sets_.withColumnRenamed(id_col, "id_b").withColumnRenamed("hset", "set_b"), "id_b")
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    return j.select(
        "id_a",
        "id_b",
        inter.alias("inter"),
        union.alias("union_"),
        (inter / F.greatest(union, F.lit(1))).alias("jaccard"),
    )


def minhash_lsh(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-dup detection: shingle → MinHash → LSH → verify.

    Returns verified pairs ``(id_a, id_b, jaccard)`` with
    ``jaccard >= threshold``. Shuffle census: set collapse (1,
    map-combined), bucket join (1), pair distinct (1), verify joins
    (2 small) — constant number of shuffles regardless of corpus size;
    nothing is ever O(n²). Signatures and bands are per-row array math
    over the materialized set table (zero shuffles).
    """
    rows_per_band = num_hashes // bands
    # ONE tokenize scan + ONE collect_set shuffle, materialized: the old
    # declarative form recomputed the shingle explode + a 16-min groupBy
    # for the signature path AND a second explode + collect_set for the
    # verify path (the two consumers can't share a subplan). Signatures
    # are now per-row array mins over the materialized set table (zero
    # shuffles past the collapse); verify reuses the same checkpoint.
    # repartition before the cut: AQE coalesces the per-doc collapse and
    # an eager localCheckpoint would freeze that (~1-partition) layout
    # for every consumer (same fix as the prefix-join family).
    par = df.sparkSession.sparkContext.defaultParallelism
    sets_ = (
        shingle_sets(df, id_col, text_col, k)
        .repartition(par)
        .localCheckpoint(eager=True)
    )
    sig = minhash_signatures_from_sets(sets_, id_col, num_hashes)
    buckets = lsh_buckets(sig, id_col, bands, rows_per_band)
    pairs = candidate_pairs(buckets, id_col)
    verified = ngram_jaccard(pairs, None, id_col, sets=sets_)
    return verified.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def jaccard_prefix_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    emit: str = "clusters",
    max_pairs: int | None = None,
) -> DataFrame:
    """EXACT set-similarity self-join: documents related by token-set
    Jaccard ≥ ``threshold``, found without LSH approximation OR an
    all-pairs join.

    **Output contract — safe by default.** ``emit='clusters'`` (the
    default) returns ONE ROW PER DOCUMENT ``(id_col, rep_id)`` where
    ``rep_id`` is the smallest document id reachable through ≥threshold
    similarity (connected components over the verified set-pair graph) —
    output is LINEAR in corpus size no matter how duplicate-heavy the
    data is, because identical token sets collapse to one graph node and
    are never pairwise expanded. ``emit='pairs'`` is the opt-in explicit
    pair list ``(id_a, id_b, inter, union_, jaccard)``; its output is
    Ω(#qualifying pairs), which grows ~k² per group of k near-identical
    documents — on a duplicate-heavy 100 TB corpus that is unbounded, so
    pair mode should be reserved for audits at high thresholds or capped
    with ``max_pairs``: when set, the expansion size is pre-counted from
    the linear-size set-pair/membership tables (an aggregate, no pair is
    materialized) and a ``ValueError`` is raised if it would exceed the
    cap.

    The prefix-filtering principle (Chaudhuri et al. ICDE'06 SSJoin;
    Bayardo et al. WWW'07 All-Pairs): order the vocabulary by a global
    total order (document frequency ascending — rarest first — then token);
    if Jaccard(A,B) ≥ t then |A∩B| ≥ ⌈t·|A|⌉, so A's first
    ``|A| − ⌈t·|A|⌉ + 1`` tokens under that order must contain a common
    token with B's prefix. Candidates therefore come from an EQUI-join on
    prefix tokens only — and because high-df tokens (stopwords,
    boilerplate) sort LAST, they almost never enter a prefix, which is
    precisely what kills the hot-key skew a naive token join would have.
    A join-local length filter (``min(|A|,|B|) ≥ t·max(|A|,|B|)``,
    necessary for Jaccard ≥ t) prunes further before the distinct.

    The prefix/length filters use a 1e-9 slack so float rounding can only
    WIDEN the candidate set; the exact array-intersect verify makes the
    final answer independent of them — this is the exact-threshold
    complement to :func:`minhash_lsh` (which trades exactness for a
    constant candidate rate).

    **Distinct-set collapse** (the same move as the SimHash
    distinct-fingerprint join): identical token SETS collapse to one
    128-bit set fingerprint before any expensive stage, so the prefix
    join and the verify run over distinct content only — replicate a
    duplicate-heavy corpus 10× and the candidate/verify work is
    UNCHANGED; only the final pair expansion (streamed join output,
    inherently output-bound) grows. Same-set doc pairs are emitted as
    Jaccard-1.0 cliques without any intersect at all.

    Verify arrays carry xxhash64(token) longs, not strings: the intersect
    over millions of candidate pairs is the dominant remaining cost and
    long compares are ~2× faster (measured 38.8s → 17.1s at sf0.1 / 965k
    output pairs, pre-collapse). |A∩B| over an injective hash equals
    |A∩B| over tokens; a 64-bit collision inside one pair's sets is
    ~|vocab|²/2⁶⁵ — the same digest policy as the contamination/
    passage-dedup ops.

    Shuffle census: set-fingerprint dedup (1), token df agg (1,
    map-combined), per-set prefix window (1), prefix equi-join (1), pair
    distinct (1), verify + expansion joins (AQE-sized, keyed on the
    fingerprint). No stage is O(n²). Because Spark self-joins don't share
    subplans, the three reused intermediates (tokenized docs, the
    distinct-set table, the ranked prefix table) are MATERIALIZED with an
    eager ``localCheckpoint`` before fan-out: the tokenize/md5/xxhash
    scan, the set dedup, and the df-agg + prefix window each run exactly
    ONCE; every join side afterwards reads the materialized partitions
    (executor memory spilling to local disk). At 100 TB the same three
    cut points become parquet intermediates — same plan shape, durable
    storage.

    Returns ``(id_col, rep_id)`` for ``emit='clusters'``;
    ``(id_a, id_b, inter, union_, jaccard)`` for ``emit='pairs'``.
    """
    from pyspark.sql import Window

    if emit not in ("clusters", "pairs"):
        raise ValueError(f"emit must be 'clusters' or 'pairs', got {emit!r}")
    t = threshold
    docs = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(tokens(text_col)).alias("toks"),
    ).withColumn(
        # md5 over the sorted set, kept as 16-byte BINARY: 128 bits keeps
        # fingerprint collisions (which would MERGE two different sets)
        # out of reach at billions of documents, and binary halves every
        # downstream shuffle/broadcast key vs the hex string
        "set_fp",
        F.unhex(F.md5(F.concat_ws("\x1e", F.array_sort("toks")))),
    )
    # cut point 1: one tokenize/md5 scan, reused by members (3×) and dsets
    docs = docs.localCheckpoint(eager=True)
    members = docs.select("__id", "set_fp")
    par = df.sparkSession.sparkContext.defaultParallelism
    dsets = (
        docs.select("set_fp", "toks")
        .dropDuplicates(["set_fp"])
        .withColumn("n", F.size("toks"))
        .withColumn("hset", F.transform("toks", lambda x: F.xxhash64(x)))
        # repartition BEFORE the cut: AQE coalesces the tiny dedup shuffle
        # to ~1 partition, and an eager localCheckpoint FREEZES that — the
        # xxhash transform, the token exploder and every later scan of the
        # materialization would then run single-task (measured: the
        # single-task candidate enumeration alone was ~8 s at sf0.1). One
        # round-robin exchange of the skinny distinct-set table restores
        # full parallelism for all consumers at once; at cluster scale the
        # pre-AQE partitioning is already healthy and this is a cheap
        # rebalance of the collapsed (distinct-set-bounded) table.
        .repartition(par)
        # cut point 2: one set-dedup + xxhash pass, reused by the token
        # exploder, both verify sides, and the same-set clique join
        .localCheckpoint(eager=True)
    )
    tokd = dsets.select("set_fp", "n", F.explode("toks").alias("tok"))
    # df over distinct sets (any consistent global order is correct; this
    # one still sorts boilerplate tokens out of prefixes). Vocabulary-sized
    # side: unhinted — AQE broadcasts while it fits
    dfreq = tokd.groupBy("tok").agg(F.count("*").alias("df"))
    ranked = tokd.join(dfreq, "tok")
    w = Window.partitionBy("set_fp").orderBy(F.col("df").asc(), F.col("tok").asc())
    prefix_len = F.col("n") - F.ceil(F.col("n") * t - 1e-9) + 1
    prefix = (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= prefix_len)
        .select(
            "tok",
            F.col("set_fp").alias("pfp"),
            F.col("n").alias("pn"),
            F.col("rn").alias("prn"),
        )
        # same repartition-before-cut as dsets: the prefix self-join's
        # PROBE side scans this materialization, so a frozen 1-partition
        # layout would serialize the whole candidate enumeration
        .repartition(par)
        # cut point 3: the df agg + join + prefix window run once; the
        # prefix SELF-join below reads this materialization on both sides
        .localCheckpoint(eager=True)
    )
    # Length filter AS A JOIN KEY, not a post-join condition: Jaccard ≥ t
    # admits only partner sizes n_b ∈ [⌈t·n_a⌉, ⌊n_a/t⌋] (a handful at
    # high t), so the a-side explodes over its admissible partner sizes
    # and the join keys on (tok, size). On a low-vocabulary corpus the
    # token alone degenerates (one prefix token can cover most sets —
    # measured df 2792/3935 sets on the synthetic corpus, 24M enumerated
    # pairs); keying by size divides every hot token's bucket by the size
    # spread BEFORE enumeration instead of filtering after (measured 24M →
    # 8.8M enumerations, query 6.3s → 5.2s at sf0.1, candidate set
    # unchanged at 1.96M). The 1e-9 slack mirrors the old filter — it can
    # only WIDEN the size range.
    a = prefix.select(
        "tok", F.col("pfp").alias("fp_a"), F.col("pn").alias("n_a"), F.col("prn").alias("rn_a")
    ).withColumn(
        "n_b",
        F.explode(
            F.sequence(
                F.ceil(F.col("n_a") * t - 1e-9).cast("int"),
                F.floor((F.col("n_a") + 1e-9) / t).cast("int"),
            )
        ),
    )
    b = prefix.select(
        "tok", F.col("pfp").alias("fp_b"), F.col("pn").alias("n_b"), F.col("prn").alias("rn_b")
    )
    cand = (
        a.join(b, ["tok", "n_b"])
        .filter(F.col("fp_a") < F.col("fp_b"))
        # PPJoin positional filter: a match at prefix positions (rn_a,
        # rn_b) bounds the achievable overlap by 1 + min(remaining
        # suffixes); below the required α = t/(1+t)·(n_a+n_b) the pair
        # can't reach threshold — join-local, prunes before any shuffle
        .filter(
            (1 + F.least(F.col("n_a") - F.col("rn_a"), F.col("n_b") - F.col("rn_b"))).cast(
                "double"
            )
            >= (t / (1 + t)) * (F.col("n_a") + F.col("n_b")) - 1e-9
        )
        .select("fp_a", "fp_b")
        # The prefix table is tiny (|distinct sets| · prefix_len rows), so
        # AQE coalesces the self-join output to ~1 partition — but the
        # JOIN OUTPUT is millions of candidate pairs, and the expensive
        # array-intersect verify would then run single-threaded in that
        # stage. A round-robin exchange of the skinny (fp_a, fp_b) pairs
        # (32 bytes/row) restores full parallelism for the verify:
        # measured 8.9s → 0.9s at sf0.1 (1.96M candidates, 32 cores).
        .repartition(df.sparkSession.sparkContext.defaultParallelism)
    )
    # NO mid-pipeline distinct: pairs sharing several prefix tokens appear
    # a few times (~13% dupes measured at sf0.1) — verifying duplicates is
    # cheaper than a corpus-scale pair exchange; the dedup happens on the
    # ~70× smaller VERIFIED pair set below
    sets_ = dsets.select("set_fp", "hset", "n")
    j = (
        cand.join(
            sets_.select(
                F.col("set_fp").alias("fp_a"), F.col("hset").alias("set_a"), F.col("n").alias("na")
            ),
            "fp_a",
        ).join(
            sets_.select(
                F.col("set_fp").alias("fp_b"), F.col("hset").alias("set_b"), F.col("n").alias("nb")
            ),
            "fp_b",
        )
    )
    # Verify in two stages so the intersect runs ONCE per candidate:
    # filtering directly on inter/union ≥ t collapses into the broadcast-
    # join CONDITION with array_intersect evaluated twice per row (once in
    # the ratio, once in the union) — measured 2× the whole verify cost.
    # Stage 1 (join condition): the overlap form jacc ≥ t ⟺ (1+t)·inter ≥
    # t·(na+nb), one intersect, 1e-9-slacked so rounding only WIDENS.
    # Stage 2: survivors (~70× fewer) re-project inter and apply the EXACT
    # double-division filter the oracle computes, behind a localCheckpoint
    # barrier so the exact filter cannot be pushed back into the join.
    inter = F.size(F.array_intersect("set_a", "set_b"))
    overlap_ok = inter.cast("double") >= (t / (1 + t)) * (
        F.col("na") + F.col("nb")
    ) - 1e-9
    pre = (
        j.filter(overlap_ok)
        .select("fp_a", "fp_b", inter.alias("inter"), "na", "nb")
        .localCheckpoint(eager=False)
    )
    union = F.col("na") + F.col("nb") - F.col("inter")
    fp_pairs = (
        pre.select(
            "fp_a",
            "fp_b",
            "inter",
            union.alias("union_"),
            (F.col("inter") / F.greatest(union, F.lit(1))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t)
        .dropDuplicates(["fp_a", "fp_b"])
    )
    if emit == "clusters":
        # LINEAR form: label every distinct set with its min member id
        # (injective — each doc belongs to exactly one set), lift the
        # verified set pairs to label edges, and min-label CC gives each
        # document the smallest doc id reachable through ≥t similarity.
        # Same-set documents share a label, so k identical texts are ONE
        # graph node — no clique is ever expanded.
        from etl_spark.operators.graph import connected_components

        lids = members.groupBy("set_fp").agg(F.min("__id").alias("lid"))
        edges = (
            fp_pairs.select("fp_a", "fp_b")
            .join(lids.select(F.col("set_fp").alias("fp_a"),
                              F.col("lid").alias("src")), "fp_a")
            .join(lids.select(F.col("set_fp").alias("fp_b"),
                              F.col("lid").alias("dst")), "fp_b")
            .select("src", "dst")
        )
        comp = connected_components(
            lids.select(F.col("lid").alias("id")), edges,
            id_col="id", src_col="src", dst_col="dst",
        )
        return (
            members.join(lids, "set_fp")
            .join(comp, F.col("lid") == F.col("id"))
            .select(F.col("__id").alias(id_col), F.col("component").alias("rep_id"))
        )
    if max_pairs is not None:
        # pre-flight expansion count over the LINEAR tables (set sizes ×
        # verified set pairs) — no pair row exists before this decides
        sizes = members.groupBy("set_fp").agg(F.count("*").alias("k"))
        cross_ct = (
            fp_pairs.select("fp_a", "fp_b")
            .join(sizes.select(F.col("set_fp").alias("fp_a"),
                               F.col("k").alias("ka")), "fp_a")
            .join(sizes.select(F.col("set_fp").alias("fp_b"),
                               F.col("k").alias("kb")), "fp_b")
            .agg(F.sum(F.col("ka") * F.col("kb")).alias("c"))
            .first()["c"] or 0
        )
        same_ct = (
            sizes.agg(F.sum(F.col("k") * (F.col("k") - 1) / 2).alias("c"))
            .first()["c"] or 0
        )
        total = int(cross_ct) + int(same_ct)
        if total > max_pairs:
            raise ValueError(
                f"jaccard_prefix_join(emit='pairs') would emit {total} pairs "
                f"(> max_pairs={max_pairs}); use emit='clusters' (linear) or "
                f"raise the cap"
            )
    # expansion 1: cross-set pairs — every (doc of A) × (doc of B), the
    # similarity computed ONCE per set pair; streamed join output
    ma = members.select(F.col("set_fp").alias("fp_a"), F.col("__id").alias("id_x"))
    mb = members.select(F.col("set_fp").alias("fp_b"), F.col("__id").alias("id_y"))
    cross = (
        fp_pairs.join(ma, "fp_a")
        .join(mb, "fp_b")
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
            "inter",
            "union_",
            "jaccard",
        )
    )
    # expansion 2: same-set cliques — Jaccard exactly 1.0, no intersect
    same = (
        members.join(
            members.withColumnRenamed("__id", "__id2"), "set_fp"
        )
        .filter(F.col("__id") < F.col("__id2"))
        .join(dsets.select("set_fp", "n"), "set_fp")
        .select(
            F.col("__id").alias("id_a"),
            F.col("__id2").alias("id_b"),
            F.col("n").alias("inter"),
            F.col("n").alias("union_"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(same)


def containment_prefix_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
    max_pairs: int | None = None,
    emit: str = "pairs",
) -> DataFrame:
    """EXACT directional token-set CONTAINMENT self-join: rows
    ``(id_a, id_b, inter, n_a, containment)`` with
    ``containment = |S(a) ∩ S(b)| / |S(a)| ≥ threshold`` and
    ``id_a ≠ id_b`` — the subset-duplication audit. Containment is the
    asymmetric complement to :func:`jaccard_prefix_join`: a 50-token doc
    fully embedded in a 500-token doc has Jaccard ≤ 0.1 (invisible to
    the symmetric pass) but containment 1.0 — exactly the
    quote-expansion / doc-in-doc templating a training-data dedup needs
    to see (the "Deduplicating Training Data" ExactSubstr motivation,
    at set granularity).

    One-sided prefix filter (SSJoin, Chaudhuri et al. ICDE'06): if
    ``inter ≥ ⌈t·n_a⌉`` then A's first ``n_a − ⌈t·n_a⌉ + 1`` tokens
    under the global df-ascending order must hit B — candidates come
    from an equi-join of A-PREFIX tokens against B's ALL tokens. B gets
    no prefix (containment bounds the overlap by |A| alone), but the
    skew killer survives: prefix tokens are globally RARE by the df
    ordering, so the join key distribution is the df of rare tokens,
    never the stopword spine. Join-local size filter
    ``n_b ≥ ⌈t·n_a⌉`` (overlap ≤ |B|) prunes before the shuffle.

    Distinct-set collapse, df-ordered prefixes, xxhash64 verify arrays,
    checkpointed cut points, and the pre-counted ``max_pairs`` guard all
    follow :func:`jaccard_prefix_join` (same scale shape: no stage is
    O(n²); the directional pair OUTPUT is inherently Ω(#qualifying
    pairs) — same-set cliques emit k·(k−1) ordered rows, so cap with
    ``max_pairs`` or keep thresholds high on duplicate-heavy corpora).

    ``emit="audit"`` (round 13 — the LINEAR deployment form, the same
    pairs→linear move :func:`simhash_clusters` makes for SimHash): one
    row per doc whose set is ≥t-contained in at least one OTHER
    distinct set — ``(doc_id, n_a, n_containers, best_containment,
    container_id)`` where ``n_containers`` counts container DOCS,
    ``container_id`` is the smallest container doc id at the maximum
    containment (deterministic total order). Same-set exact twins are
    excluded (that is :func:`exact_duplicates`'s domain). Every stage
    through the verify is distinct-set-bounded exactly like the pair
    form; the member expansion emits ONE row per doc, so replication
    (the k·(k−1) clique blow-up that makes the pair form output-bound —
    the measured ×100 timeout on the templated corpus) cannot reach the
    output. This is the form a duplicate-heavy 100-TB corpus runs.
    """
    from pyspark.sql import Window

    t = threshold
    docs = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(tokens(text_col)).alias("toks"),
    ).withColumn(
        "set_fp",
        F.unhex(F.md5(F.concat_ws("\x1e", F.array_sort("toks")))),
    )
    docs = docs.localCheckpoint(eager=True)  # one tokenize/md5 scan
    members = docs.select("__id", "set_fp")
    par = df.sparkSession.sparkContext.defaultParallelism
    dsets = (
        docs.select("set_fp", "toks")
        .dropDuplicates(["set_fp"])
        .withColumn("n", F.size("toks"))
        .withColumn("hset", F.transform("toks", lambda x: F.xxhash64(x)))
        # repartition before the cut (see jaccard_prefix_join): an eager
        # checkpoint freezes AQE's ~1-partition coalesce of the tiny
        # dedup shuffle, serializing every later scan of dsets
        .repartition(par)
        .localCheckpoint(eager=True)  # one set-dedup + xxhash pass
    )
    tokd = dsets.select("set_fp", "n", F.explode("toks").alias("tok"))
    dfreq = tokd.groupBy("tok").agg(F.count("*").alias("df"))
    ranked = tokd.join(dfreq, "tok")
    w = Window.partitionBy("set_fp").orderBy(F.col("df").asc(), F.col("tok").asc())
    # containment prefix: n_a − ⌈t·n_a⌉ + 1 (vs Jaccard's identical form —
    # the bound is on |A| alone here)
    prefix_len = F.col("n") - F.ceil(F.col("n") * t - 1e-9) + 1
    ranked = (
        ranked.withColumn("rn", F.row_number().over(w))
        # repartition before the cut: the one-sided join PROBES this
        # materialization with B's FULL token lists — frozen at 1
        # partition the whole enumeration would run on one task
        .repartition(par)
        .localCheckpoint(eager=True)
    )  # df agg + window once; reused by the prefix AND the b-side
    a = (
        ranked.filter(F.col("rn") <= prefix_len)
        .select("tok", F.col("set_fp").alias("fp_a"),
                F.col("n").alias("n_a"), F.col("rn").alias("rn_a"))
    )
    b = ranked.select("tok", F.col("set_fp").alias("fp_b"),
                      F.col("n").alias("n_b"), F.col("rn").alias("rn_b"))
    # PPJoin positional filter, containment form: among a pair's common
    # tokens take the FIRST under the global order — every later common
    # token sits at higher rank on both sides, so overlap ≤ 1 +
    # min(n_a − rn_a, n_b − rn_b) at that row; requiring ≥ ⌈t·n_a⌉ is
    # therefore complete (the first-match row of every qualifying pair
    # passes; later-match rows it drops were duplicates). This is the
    # hot-token killer on low-vocabulary corpora: a stopword-grade token
    # ranks LAST in B (rn_b ≈ n_b ⟹ bound ≈ 1 < t·n_a), so the b-side's
    # unbounded token list never enumerates against it — measured 29.5 s
    # → (see workload docstring) at sf0.1 with identical output.
    cand = (
        a.join(b, "tok")
        .filter(F.col("fp_a") != F.col("fp_b"))
        .filter(
            (1 + F.least(F.col("n_a") - F.col("rn_a"),
                         F.col("n_b") - F.col("rn_b"))).cast("double")
            >= F.col("n_a") * t - 1e-9
        )
        .select("fp_a", "fp_b")
        # UNLIKE the jaccard join (both sides prefixed, ~13% dupes,
        # verify-then-dedup wins), the one-sided join re-emits a pair
        # once per shared A-PREFIX token against B's full set — on a
        # templated corpus that's ~prefix_len (≈8×) duplicate verifies.
        # A pre-verify distinct of the skinny 32-byte pairs costs one
        # shuffle and removes ~8× of the array-intersect work (the
        # dominant stage); it also replaces the round-robin exchange
        # (the distinct's own exchange restores verify parallelism).
        .dropDuplicates(["fp_a", "fp_b"])
    )
    sets_ = dsets.select("set_fp", "hset", "n")
    j = (
        cand.join(
            sets_.select(F.col("set_fp").alias("fp_a"),
                         F.col("hset").alias("set_a"), F.col("n").alias("na")),
            "fp_a",
        ).join(
            sets_.select(F.col("set_fp").alias("fp_b"),
                         F.col("hset").alias("set_b")),
            "fp_b",
        )
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    pre = (
        j.filter(inter.cast("double") >= F.col("na") * t - 1e-9)
        .select("fp_a", "fp_b", inter.alias("inter"), "na")
        .localCheckpoint(eager=False)
    )
    fp_pairs = (
        pre.withColumn("containment", F.col("inter") / F.col("na"))
        .filter(F.col("containment") >= t)
        .dropDuplicates(["fp_a", "fp_b"])
    )
    if emit == "audit":
        # per container SET: member count and smallest member id — one
        # map-combined agg over the skinny membership table
        ksets = members.groupBy("set_fp").agg(
            F.count("*").alias("k"), F.min("__id").alias("mid"))
        per_set = (
            fp_pairs.join(
                ksets.select(F.col("set_fp").alias("fp_b"),
                             F.col("k").alias("kb"), F.col("mid").alias("mb")),
                "fp_b")
            .groupBy("fp_a")
            .agg(
                F.sum("kb").alias("n_containers"),
                # max containment first, then smallest container id:
                # struct max on (containment, -mb) — exact doubles order
                # identically in the oracle's (containment DESC, id ASC)
                F.max(F.struct(F.col("containment"),
                               (-F.col("mb")).alias("nid"))).alias("best"),
            )
        )
        return (
            per_set.join(
                members.select(F.col("set_fp").alias("fp_a"), "__id"), "fp_a")
            .join(dsets.select(F.col("set_fp").alias("fp_a"),
                               F.col("n").alias("n_a")), "fp_a")
            .select(
                F.col("__id").alias(id_col),
                "n_a",
                F.col("n_containers").cast("long").alias("n_containers"),
                F.round(F.col("best.containment"), 6).alias("best_containment"),
                (-F.col("best.nid")).alias("container_id"),
            )
        )
    if emit != "pairs":
        raise ValueError(f"unknown emit mode {emit!r}")
    if max_pairs is not None:
        sizes = members.groupBy("set_fp").agg(F.count("*").alias("k"))
        cross_ct = (
            fp_pairs.select("fp_a", "fp_b")
            .join(sizes.select(F.col("set_fp").alias("fp_a"),
                               F.col("k").alias("ka")), "fp_a")
            .join(sizes.select(F.col("set_fp").alias("fp_b"),
                               F.col("k").alias("kb")), "fp_b")
            .agg(F.sum(F.col("ka") * F.col("kb")).alias("c"))
            .first()["c"] or 0
        )
        same_ct = (
            sizes.agg(F.sum(F.col("k") * (F.col("k") - 1)).alias("c"))
            .first()["c"] or 0
        )
        total = int(cross_ct) + int(same_ct)
        if total > max_pairs:
            raise ValueError(
                f"containment_prefix_join would emit {total} directional "
                f"pairs (> max_pairs={max_pairs}); raise the threshold or "
                "the cap (the output is inherently pair-bound)"
            )
    ma = members.select(F.col("set_fp").alias("fp_a"), F.col("__id").alias("id_a"))
    mb = members.select(F.col("set_fp").alias("fp_b"), F.col("__id").alias("id_b"))
    cross = (
        fp_pairs.join(ma, "fp_a")
        .join(mb, "fp_b")
        .select("id_a", "id_b", "inter", F.col("na").alias("n_a"),
                F.round("containment", 6).alias("containment"))
    )
    # same-set: containment exactly 1.0 in BOTH directions, no intersect
    same = (
        members.join(members.withColumnRenamed("__id", "__id2"), "set_fp")
        .filter(F.col("__id") != F.col("__id2"))
        .join(dsets.select("set_fp", "n"), "set_fp")
        .select(
            F.col("__id").alias("id_a"), F.col("__id2").alias("id_b"),
            F.col("n").alias("inter"), F.col("n").alias("n_a"),
            F.lit(1.0).alias("containment"),
        )
    )
    return cross.unionByName(same)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32  # 8 md5 hex digits; portable to the SQL oracle


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash per document: ``(id, simhash)``.

    Charikar '02: each distinct token votes ±1 per bit position (bit j of
    md5(token)); the fingerprint sets bit j iff the vote sum is positive.
    Implementation is explode(tokens) → ONE groupBy(id) with 32 wide
    vote-sum columns (the same wide-column shape as the MinHash
    signatures): no per-bit row explosion, one shuffle, map-side combine
    reduces each partition to one 32-int row per document. Bits come from
    md5 hex digits via arithmetic (no bigint conversion) so the DuckDB
    oracle can mirror the fingerprint definition exactly.
    """
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    ).withColumn("h", F.md5("tok"))
    # Expressions are built as SQL STRINGS, one selectExpr per stage: the
    # Column-API form of these ~110 expressions cost ~1.4 s of py4j
    # round trips PER CALL — pure driver plan-construction time charged
    # to every bench rep (guide §7.3: very large expression trees make
    # planning itself the bottleneck). Semantics identical term-for-term.
    # 8 hex digits once per token row, then 32 constant-folded ±1 votes
    digits = tok.selectExpr(
        id_col,
        *[
            f"instr('0123456789abcdef', substring(h, {d + 1}, 1)) - 1 AS d{d}"
            for d in range(SIMHASH_BITS // 4)
        ],
    )
    votes = [
        f"((shiftright(d{j // 4}, {j % 4}) & 1) * 2 - 1) AS v{j}"
        for j in range(SIMHASH_BITS)
    ]
    sums = digits.selectExpr(id_col, *votes).groupBy(id_col).agg(
        *[F.expr(f"sum(v{j}) AS s{j}") for j in range(SIMHASH_BITS)]
    )
    fingerprint = " + ".join(
        f"CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END"
        for j in range(SIMHASH_BITS)
    )
    return sums.selectExpr(id_col, f"CAST({fingerprint} AS BIGINT) AS simhash")


def simhash_candidates(
    fp: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_pairs_per_clique: int | None = None,
    on_overflow: str = "error",
) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ ``max_hamming``.

    Pigeonhole: split the 32-bit fingerprint into 4 bytes; distance ≤ 3 ⟹
    at least one byte is identical, so candidates come from 4 equi-joins
    (unioned) instead of a cross join — the standard scalable SimHash
    lookup (Manku et al. '07, detecting near-duplicates for web crawling).
    Returns ``(id_a, id_b, hamming)``.

    Scale shape: identical fingerprints collapse to ONE row before the
    block join (duplicate-heavy corpora make hot fingerprints — replicate
    a corpus 10× and every bucket is 10× deeper, so a doc-level join
    would do 100× the work for the same distinct-fingerprint structure).
    The block join runs over distinct fingerprints only; the surviving
    fingerprint pairs then join back to the doc table twice, so the
    unavoidable |cluster|² pair listing is produced by streamed join
    output — parallel across tasks, never a giant in-row array. (For
    mega-clusters a production pipeline keeps counts + exemplar ids
    instead of materializing every pair; cap that by pre-limiting docs
    per fingerprint.)

    ``max_pairs_per_clique`` is that cap made explicit — the guard rail
    for the endpoint's inherent |clique|² output (prefer
    :func:`simhash_clusters`, one row per fingerprint, for 100 TB runs;
    SCALE.md steers there). When a same-fingerprint clique would emit
    more pairs than the budget: ``on_overflow='error'`` (default) fails
    loudly BEFORE the expansion join runs, naming the worst clique, so a
    caller can't trip the quadratic path by accident;
    ``on_overflow='truncate'`` keeps only the lowest-id members per
    fingerprint that fit the budget (deterministic, documented loss).
    """
    if max_pairs_per_clique is not None:
        import math

        from pyspark.sql import Window

        # largest clique size whose m(m-1)/2 pairs fit the budget
        cap = (1 + math.isqrt(1 + 8 * max_pairs_per_clique)) // 2
        counts = fp.groupBy("simhash").agg(F.count("*").alias("__m"))
        if on_overflow == "error":
            worst = counts.agg(F.max("__m").alias("mx")).collect()[0]["mx"] or 0
            if worst > cap:
                raise ValueError(
                    f"simhash clique of {worst} docs would emit "
                    f"{worst * (worst - 1) // 2} pairs "
                    f"(> max_pairs_per_clique={max_pairs_per_clique}); use "
                    "simhash_clusters for linear output, or "
                    "on_overflow='truncate' to cap members per fingerprint"
                )
        elif on_overflow == "truncate":
            w = Window.partitionBy("simhash").orderBy(id_col)
            fp = (
                fp.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= cap)
                .drop("__rn")
            )
        else:
            raise ValueError(f"unknown on_overflow mode {on_overflow!r}")
    distinct_fp = fp.select("simhash").distinct()
    blocks = distinct_fp.select(
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("blk"),
    ).withColumn("blk_val", F.expr("shiftright(simhash, blk * 8) & 255"))
    a = blocks.select("blk", "blk_val", F.col("simhash").alias("sh_a"))
    b = blocks.select("blk", "blk_val", F.col("simhash").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    # a fingerprint pair with k equal bytes matches in k of the 4
    # equi-joins; emit it only from the SMALLEST equal block — join-local
    # predicate, so no distinct and no second shuffle of the pair set.
    # hamming filter is also join-local: the far-pair majority never
    # leaves the join stage. sh_a == sh_b (identical fingerprints) pairs
    # survive exactly once via blk 0 (all earlier-byte tests fail).
    first_match = F.expr(
        " AND ".join(
            f"(blk <= {b} OR (shiftright(sh_a, {b * 8}) & 255) != (shiftright(sh_b, {b * 8}) & 255))"
            for b in range(3)
        )
    )
    fp_pairs = (
        a.join(b, ["blk", "blk_val"])
        .filter(F.col("sh_a") <= F.col("sh_b"))
        .filter(first_match)
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("sh_a", "sh_b", "hamming")
    )
    # streamed expansion: each surviving fingerprint pair picks up its
    # member docs from two joins. Shuffle volume is (candidate fp pair ×
    # side) rows — the m×n pair OUTPUT is join-stage streaming, and the
    # same-fingerprint m² case collapses to i<j by the id ordering filter.
    da = fp.select(F.col(id_col).alias("id_x"), F.col("simhash").alias("sh_a"))
    db = fp.select(F.col(id_col).alias("id_y"), F.col("simhash").alias("sh_b"))
    return (
        fp_pairs.join(da, "sh_a")
        .join(db, "sh_b")
        .filter((F.col("sh_a") < F.col("sh_b")) | (F.col("id_x") < F.col("id_y")))
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
            "hamming",
        )
    )


def simhash_clusters(
    fp: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    preview_k: int = 5,
) -> DataFrame:
    """Clique-aggregated SimHash dedup output: ONE row per distinct
    fingerprint instead of O(|clique|²) pairs.

    The pair-emitting endpoint (:func:`simhash_candidates`) is inherently
    quadratic in clique size on duplicate-heavy corpora — emitting every
    intra-clique pair of a 10k-replica template is 50M output rows that a
    downstream keep-list immediately re-collapses. This operator returns
    the collapsed form directly (the form ``dedup_keep_list`` consumes,
    and the reference's bounded-batch output philosophy,
    `etl/src/replication/apply.rs:645-695`): per fingerprint-clique the
    member count, the canonical representative (min id), a bounded
    ``preview_k``-member preview, the pair count the clique WOULD have
    expanded to, and its Hamming-≤``max_hamming`` neighborhood stats over
    DISTINCT fingerprints (how many near fingerprints, how many docs they
    hold) so near-dup pressure is still visible without pair expansion.

    Scale shape: output is |distinct fingerprints| rows — LINEAR in
    corpus structure regardless of clique depth (replicate the corpus 10×
    and the row count is unchanged; only counts grow). Two shuffles on
    ``simhash`` (count-agg + WindowGroupLimit preview), then the
    byte-block pigeonhole self-join over distinct fingerprints only —
    identical join shape to :func:`simhash_candidates` but with
    clique-size aggregation instead of two member-expansion joins.
    """
    from pyspark.sql import Window

    cliq = fp.groupBy("simhash").agg(
        F.count("*").alias("n_docs"), F.min(id_col).alias("rep_id")
    )
    w = Window.partitionBy("simhash").orderBy(F.col(id_col).asc())
    prev = (
        fp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= preview_k)
        .groupBy("simhash")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(id_col)), lambda x: x.cast("string")
                ),
                ",",
            ).alias("members_preview")
        )
    )
    # Hamming-≤k adjacency over distinct fingerprints (pigeonhole blocks,
    # single-block emission — the simhash_candidates join, both directions)
    blocks = cliq.select(
        "simhash", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("blk")
    ).withColumn("blk_val", F.expr("shiftright(simhash, blk * 8) & 255"))
    a = blocks.select("blk", "blk_val", F.col("simhash").alias("sh_a"))
    b = blocks.select("blk", "blk_val", F.col("simhash").alias("sh_b"))
    first_match = F.expr(
        " AND ".join(
            f"(blk <= {j} OR (shiftright(sh_a, {j * 8}) & 255) != (shiftright(sh_b, {j * 8}) & 255))"
            for j in range(3)
        )
    )
    adj = (
        a.join(b, ["blk", "blk_val"])
        .filter(F.col("sh_a") != F.col("sh_b"))
        .filter(first_match)
        .filter(F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))) <= max_hamming)
        .select("sh_a", "sh_b")
    )
    nstats = (
        adj.join(
            cliq.select(F.col("simhash").alias("sh_b"), F.col("n_docs").alias("nb_docs")),
            "sh_b",
        )
        .groupBy("sh_a")
        .agg(
            F.count("*").alias("n_neighbor_fps"),
            F.sum("nb_docs").alias("neighbor_docs"),
        )
        .withColumnRenamed("sh_a", "simhash")
    )
    return (
        cliq.join(prev, "simhash")
        .join(nstats, "simhash", "left")
        .select(
            "simhash",
            "n_docs",
            F.expr("CAST(n_docs * (n_docs - 1) DIV 2 AS BIGINT)").alias("intra_pairs"),
            "rep_id",
            "members_preview",
            F.coalesce("n_neighbor_fps", F.lit(0).cast("long")).alias("n_neighbor_fps"),
            F.coalesce("neighbor_docs", F.lit(0).cast("long")).alias("neighbor_docs"),
        )
    )


def minhash_lsh_incremental(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental near-dup detection: dedup a NEW batch against an
    existing corpus plus itself, never joining old×old.

    The daily-ingestion pattern: a grown corpus is not re-deduped from
    scratch — the new batch's LSH bands probe the standing band index
    (in production a persisted table keyed by ``(band, band_hash)``; here
    derived from ``old_df`` so the operator is self-contained) and
    self-join within the batch. Join cost scales with
    ``|new| × bucket_occupancy``, independent of how large the old corpus
    has grown — the property that keeps ingestion dedup O(day), not
    O(history). Candidates are canonicalized (least, greatest) so
    new-new pairs emitted in both orders collapse; verification is the
    same exact-Jaccard stage as :func:`minhash_lsh`.

    Returns verified pairs ``(id_a, id_b, jaccard)`` with at least one
    NEW side and ``jaccard >= threshold``.
    """
    rows_per_band = num_hashes // bands
    # ONE materialized shingle-set collapse PER SIDE (the minhash_lsh
    # move): the old form re-ran each side's shingle explode twice (the
    # signature groupBy and the verify collect_set can't share a subplan)
    # and paid the wide 16-min groupBy over exploded shingle rows.
    # Signatures are per-row array mins over the set table (identical
    # values — min over a set equals min over its exploded rows) and the
    # verify reuses the same materialization. repartition before the cut:
    # AQE coalesces the per-doc collapse and an eager localCheckpoint
    # would freeze that ~1-partition layout for every consumer.
    par = old_df.sparkSession.sparkContext.defaultParallelism
    sets_old = (
        shingle_sets(old_df, id_col, text_col, k)
        .repartition(par)
        .localCheckpoint(eager=True)
    )
    sets_new = (
        shingle_sets(new_df, id_col, text_col, k)
        .repartition(par)
        .localCheckpoint(eager=True)
    )
    b_old = lsh_buckets(
        minhash_signatures_from_sets(sets_old, id_col, num_hashes), id_col, bands, rows_per_band
    )
    b_new = lsh_buckets(
        minhash_signatures_from_sets(sets_new, id_col, num_hashes), id_col, bands, rows_per_band
    )
    probe = b_new.select("band", "band_hash", F.col(id_col).alias("id_x"))
    index = (
        b_old.unionByName(b_new)
        .select("band", "band_hash", F.col(id_col).alias("id_y"))
    )
    cand = (
        probe.join(index, ["band", "band_hash"])
        .filter(F.col("id_x") != F.col("id_y"))
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
        )
        .distinct()
    )
    # ids are disjoint across sides (a NEW batch vs the standing corpus),
    # so the union of per-side set tables is the per-id set table
    sets_all = sets_old.unionByName(sets_new)
    verified = ngram_jaccard(cand, None, id_col, sets=sets_all)
    return verified.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")
