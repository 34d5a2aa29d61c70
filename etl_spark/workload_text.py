"""Training-data pipeline queries: dedup / similarity / text analysis.

Each callable is (spark, sf_dir) → DataFrame, with its DuckDB oracle twin
in :mod:`etl_spark.oracles`. Similarity values are rounded in outputs so
the hash compare is stable across summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.io import read_table
from etl_spark.operators import dedup, similarity, text


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # small single-file tables arrive as ONE partition — per-row-heavy
    # operators (hashing, O(n²) verifies) would run on one core; spread to
    # the cluster width first (cheap: the table is tiny, the work is not).
    # NOTE: join-role-sensitive spreading (e.g. keep the broadcast side
    # un-repartitioned) happens inside the operators themselves.
    return read_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings")


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by normalized content hash — one shuffle."""
    return dedup.exact_duplicates(_docs(spark, sf_dir))


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs: 3-shingles → 16 MinHashes → 4 LSH bands → exact
    Jaccard verify ≥ 0.3."""
    out = dedup.minhash_lsh(
        _docs(spark, sf_dir), k=3, num_hashes=16, bands=4, threshold=0.3
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard on a deterministic candidate set (adjacent
    doc_ids) — the verify operator standalone."""
    docs = _docs(spark, sf_dir)
    pairs = docs.select(F.col("doc_id").alias("id_a")).withColumn(
        "id_b", F.col("id_a") + 1
    ).join(
        docs.select(F.col("doc_id").alias("id_b")), "id_b", "left_semi"
    )
    sh = dedup.shingles(docs, k=3)
    out = dedup.ngram_jaccard(pairs, sh)
    return out.select("id_a", "id_b", "inter", "union_", F.round("jaccard", 6).alias("jaccard"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints per document."""
    return dedup.simhash(_docs(spark, sf_dir))


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3) via the byte-block pigeonhole
    join."""
    fp = dedup.simhash(_docs(spark, sf_dir))
    return dedup.simhash_candidates(fp, max_hamming=3)


def dedup_simhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clique-aggregated SimHash dedup: one row per distinct fingerprint
    (count, representative, bounded preview, would-be pair count,
    Hamming-≤3 neighborhood stats) — the LINEAR-output form of
    ``dedup_simhash_pairs`` that 100 TB duplicate-heavy corpora should
    use (pair enumeration is quadratic in clique size; see SCALE.md)."""
    fp = dedup.simhash(_docs(spark, sf_dir))
    return dedup.simhash_clusters(fp, max_hamming=3, preview_k=5)


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID + per-language scores."""
    out = text.lang_id(_docs(spark, sf_dir))
    cols = ["doc_id", "lang_pred"] + [f"score_{code}" for code in sorted(text.LANG_PROFILES)]
    sel = [F.col("doc_id"), F.col("lang_pred")] + [
        F.round(f"score_{code}", 6).alias(f"score_{code}") for code in sorted(text.LANG_PROFILES)
    ]
    return out.select(*sel)


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features + combined score per document."""
    out = text.quality_score(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("quality", 6).alias("quality"),
    )


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish piece count + chars/4 estimate."""
    return text.token_counts(_docs(spark, sf_dir)).select(
        "doc_id", "n_ws_tokens", "n_bpe_pieces", "n_tokens_est"
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + normalized md5 fingerprints per document."""
    return text.fingerprint(_docs(spark, sf_dir)).select("doc_id", "fp_exact", "fp_norm")


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for the first 10 vectors as queries."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    out = similarity.cosine_topk(emb, queries, k=5)
    return out.select("query_id", "vec_id", F.round("sim", 6).alias("sim"), "rank")


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 (cells = label groups, centroids = cell means,
    nprobe=2). "Approximate" refers to recall vs brute force — the result
    is fully deterministic given the data, so it has an exact SQL oracle
    (same double-widened fold-cosine as ann_cosine_topk)."""
    emb = _emb(spark, sf_dir)
    # centroids = per-label component means: posexplode → groupBy(label,pos)
    # avg → re-assemble ordered array (all map-side-combinable aggregations)
    comp = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    centroids = (
        comp.groupBy("label", "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda x: x["m"]
            ).alias("embedding")
        )
        .withColumnRenamed("label", "cell_id")
    )
    corpus = emb.withColumn("cell_id", F.col("label"))
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.ivf_topk(corpus, centroids, queries, k=5, nprobe=2)
    return out.select("query_id", "vec_id", F.round("sim", 6).alias("sim"), "rank")


def embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim ≥ 0.35) via GEMM
    candidate pruning + exact verify — identical results to the brute
    force/oracle formula, BLAS-speed candidate generation."""
    out = similarity.cosine_pairs_fast(_emb(spark, sf_dir), threshold=0.35)
    return out.select("id_a", "id_b", F.round("sim", 6).alias("sim"))


def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup pipeline output: the documents that SURVIVE.

    Composition of the two cheapest passes (the real training-data flow):
    1. exact: keep only the min doc_id of each content-fingerprint group;
    2. near-dup: among survivors, drop any doc that is the larger id of a
       verified MinHash pair (jaccard ≥ 0.5).

    Pairwise keep-smallest is deterministic and shuffle-bounded; full
    transitive-closure clustering is an iterative (connected-components)
    job a real pipeline runs offline — pairs from stage 2 are its input.
    """
    docs = _docs(spark, sf_dir)
    keepers = dedup.exact_duplicates(docs).select(
        F.col("min_doc_id").alias("doc_id")
    )
    near = dedup.minhash_lsh(docs, threshold=0.5).select(
        F.col("id_b").alias("doc_id")
    ).distinct()
    out = keepers.join(near, "doc_id", "left_anti")
    return out.select("doc_id")


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data curation pipeline — every stage in one
    declarative plan Catalyst optimizes as a whole:

    1. dedup survivors (exact fingerprint keep-min + MinHash near-dup drop
       — :func:`dedup_keep_list`);
    2. quality gate: combined score ≥ 0.5 (:mod:`operators.text`);
    3. language-stratified downsample (deterministic md5-uniform).

    Output = the curated corpus manifest (doc_id, lang, n_tokens, quality).
    Scale shape: stages 2-3 are scan-stage column algebra; the only
    shuffles are the dedup pipeline's own (bounded, see SCALE.md), and the
    final joins are keyed on doc_id.
    """
    docs = _docs(spark, sf_dir)
    survivors = dedup_keep_list(spark, sf_dir)
    q = text.quality_score(docs).select(
        "doc_id", "n_tokens", F.round("quality", 6).alias("quality")
    )
    rates = {"en": 0.5, "de": 0.25, "es": 0.25, "fr": 0.1, "zh": 0.1}
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast(
        "double"
    ) / F.lit(float(1 << 52))
    rate = F.lit(None).cast("double")
    for lang, r in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    out = (
        survivors.join(q, "doc_id")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .filter(F.col("quality") >= 0.5)
        .filter(u < rate)
    )
    return out.select("doc_id", "lang", "n_tokens", "quality")


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the concat-and-chunk pretraining primitive:
    assign each document a (sequence id, offset) inside fixed token-budget
    training sequences, per language.

    Spark shape: deterministic order (doc_id) within each pack group, a
    cumulative-token window, then ``seq = cum_before // budget``. Packing
    groups are ``(lang, shard)`` with ``shard = doc_id % 8``: packing is
    an arbitrary grouping, so sharding the window key is semantics-free
    but keeps the shuffle keyed on |langs| × shards partitions instead of
    |langs| — the 5-language corpus would otherwise collapse onto 5 tasks
    at 100 TB (window-skew trap).
    """
    budget = 2048
    docs = _docs(spark, sf_dir)
    toks = text.token_counts(docs).select("doc_id", "lang", "n_ws_tokens")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang", F.col("doc_id") % 8)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_ws_tokens").over(w)
    out = toks.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % 8).cast("int").alias("shard"),
        F.col("n_ws_tokens").alias("n_tokens"),
        ((cum - F.col("n_ws_tokens")) / budget).cast("long").alias("seq_id"),
        ((cum - F.col("n_ws_tokens")) % budget).cast("long").alias("seq_offset"),
    )
    return out


def corpus_token_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data mixing: per language, take documents in a
    deterministic pseudo-random order until a token budget fills — the
    "N billion tokens of lang X" selection step of a pretraining mix.

    Budgets are PER (lang, shard) with shard = doc_id % 8 (total budget /
    8 per shard): budget-capped selection needs an ordered scan within
    each budget group, so sharding the group key bounds every sort at
    1/8th per language and keeps |langs|×8 parallel tasks — same
    skew-avoidance as sequence packing. Order = md5-uniform of doc_id
    (deterministic; re-runs and the oracle agree row-for-row).
    """
    shard_budget = 2500  # tokens per (lang, shard); total = 8x per lang
    docs = _docs(spark, sf_dir)
    toks = text.token_counts(docs).select("doc_id", "lang", "n_ws_tokens")
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast(
        "double"
    ) / F.lit(float(1 << 52))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang", F.col("doc_id") % 8)
        .orderBy(u.asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_ws_tokens").over(w)
    out = toks.withColumn("__cum_before", cum - F.col("n_ws_tokens")).filter(
        F.col("__cum_before") < shard_budget
    )
    return out.select(
        "doc_id", "lang", F.col("n_ws_tokens").alias("n_tokens")
    )


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS: connected components over the verified MinHash
    near-dup pairs (iterative min-label propagation,
    :mod:`etl_spark.operators.graph`). component = min doc_id reachable —
    deterministic, so even the iterative algorithm has an exact SQL oracle
    (recursive CTE)."""
    from etl_spark.operators.graph import connected_components

    docs = _docs(spark, sf_dir)
    pairs = dedup.minhash_lsh(docs, threshold=0.5).select("id_a", "id_b")
    out = connected_components(
        docs.select("doc_id"), pairs, id_col="doc_id", src_col="id_a", dst_col="id_b"
    )
    return out


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling — the training-data mixing
    primitive (downsample over-represented languages).

    Keep predicate: md5-uniform(doc_id) < rate(lang). Pure column algebra,
    no shuffle at all (sampling is scan-stage); deterministic, so re-runs
    and the oracle agree row-for-row. Production shape: the rates come
    from a broadcast-joined mix-spec dim instead of a literal CASE.
    """
    rates = {"en": 0.5, "de": 0.25, "es": 0.25, "fr": 0.1, "zh": 0.1}
    docs = _docs(spark, sf_dir)
    # first 13 md5 hex digits = exact 52-bit integer → exact double in [0,1)
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast(
        "double"
    ) / F.lit(float(1 << 52))
    rate = F.lit(None).cast("double")
    for lang, r in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return docs.filter(u < rate).select("doc_id", "lang")


def docs_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document.

    Shape: explode(tokens) → (doc, term) counts [shuffle 1] → term document
    frequency [shuffle 2, map-combined] → broadcast DF back onto the term
    table → per-doc rank window [shuffle 3]. Corpus size N arrives as a
    1-row broadcast, never a driver-side collect. The DF side is
    vocabulary-sized, so its join is left unhinted — AQE broadcasts it at
    small scale and falls back to shuffle join when the vocabulary
    outgrows the threshold. Ranking is by integer (tf DESC, term ASC) so
    cross-engine float ulps can't reorder it; the tfidf score itself is
    reported rounded.
    """
    docs = _docs(spark, sf_dir)
    from pyspark.sql import Window

    term = docs.select(
        "doc_id", F.explode(text.tokens("text")).alias("term")
    ).filter(F.col("term") != "")
    tf = term.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df_docs"))
    n = docs.agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("term").asc())
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id",
            "term",
            "tf",
            "df_docs",
            F.round(
                F.col("tf") * (F.log((F.col("n_docs") + 1.0) / (F.col("df_docs") + 1.0)) + 1.0), 4
            ).alias("tfidf"),
            "rank",
        )
    )


def docs_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data text cleanup: strip URLs and e-mail addresses,
    collapse whitespace, lowercase — then fingerprint the cleaned text.

    All JVM-side regexp work in the scan stage (no shuffle, no Python).
    Patterns stay inside the regex subset Java and RE2 interpret
    identically, so the oracle mirrors them verbatim.
    """
    docs = _docs(spark, sf_dir)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), r"https?://[^\s]+", " "),
                r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", " ",
            ),
            r"\s+", " ",
        )
    )
    return docs.select(
        "doc_id",
        F.length(cleaned).alias("clean_len"),
        F.md5(cleaned).alias("clean_fp"),
        (F.length("text") - F.length(cleaned)).alias("removed_chars"),
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN top-5 (6-bit random-hyperplane buckets,
    deterministic planes). The bucket equi-join replaces the brute-force
    cross join — per-query cost is bucket occupancy, not corpus size."""
    emb = _emb(spark, sf_dir)
    # the sign-plane matrix AND its pre-expanded SQL oracle are built for
    # 64 components; a regenerated embeddings table with another dim would
    # silently produce null buckets (zip_with pads) — the loud guard is
    # IN-PLAN (lsh_bucket check_dim raise_error): same failure contract,
    # no per-call len(head()) driver job (guide §1.2/§7.3)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.lsh_topk(emb, queries, k=5, n_bits=6, dim=64)
    return out.select("query_id", "vec_id", F.round("sim", 6).alias("sim"), "rank")


def docs_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: confusion matrix of predicted vs labeled
    language — the report every classifier-driven filter stage needs.
    One extra shuffle over the scan-stage lang_id expression."""
    out = text.lang_id(_docs(spark, sf_dir))
    return (
        out.groupBy(F.col("lang").alias("lang_true"), F.col("lang_pred"))
        .agg(F.count("*").alias("n_docs"))
    )


def docs_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: e-mails, IPv4 addresses, phone numbers
    found, counted, and replaced with typed placeholders.

    The synthetic corpus is PII-free, so a deterministic doc_id-derived
    injection makes the redaction path non-vacuous (and exactly
    reproducible in the oracle). All regexp work is JVM-side in the scan
    stage — no shuffle, no Python; patterns stay inside the Java∩RE2
    subset so DuckDB mirrors them verbatim.
    """
    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(did % 7 == 0, F.concat(
            F.lit(" contact user"), did.cast("string"), F.lit("@example.com now"))
        ).otherwise(F.lit("")),
        F.when(did % 11 == 0, F.concat(
            F.lit(" from 10.0."), (did % 256).cast("string"), F.lit(".1"))
        ).otherwise(F.lit("")),
        F.when(did % 13 == 0, F.concat(
            F.lit(" call 555-"), F.lpad((did % 1000).cast("string"), 3, "0"),
            F.lit("-0199"))
        ).otherwise(F.lit("")),
    )
    email = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
    ipv4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    phone = r"\b\d{3}-\d{3}-\d{4}\b"
    d = docs.select("doc_id", aug.alias("aug"))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), email, "<EMAIL>"), ipv4, "<IP>"
        ),
        phone, "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("aug"), F.lit(email), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("aug"), F.lit(ipv4), F.lit(0))).alias("n_ips"),
        F.size(F.regexp_extract_all(F.col("aug"), F.lit(phone), F.lit(0))).alias("n_phones"),
        F.md5(red).alias("redacted_fp"),
        (F.length("aug") - F.length(red)).alias("removed_chars"),
    )


def docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition stats per document: duplicate-word
    fraction, top-word fraction, top-bigram fraction, and a keep flag.

    Two aggregations keyed by doc_id (words, bigrams) — each a single
    shuffle partitioned by the document key, so the plan scales with the
    corpus; no per-document driver work.
    """
    docs = _docs(spark, sf_dir)
    d = docs.select("doc_id", F.split("text", " ").alias("ws"))
    u = d.select("doc_id", F.size("ws").alias("n"), F.explode("ws").alias("w"))
    wagg = (
        u.groupBy("doc_id", "n", "w").agg(F.count("*").alias("c"))
        .groupBy("doc_id", "n")
        .agg(F.max("c").alias("top_c"), F.count("*").alias("n_distinct"))
    )
    bg = d.filter(F.size("ws") >= 2).select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, size(ws)-1),"
            " i -> concat(element_at(ws, i), ' ', element_at(ws, i+1)))"
        )).alias("b"),
    )
    bagg = (
        bg.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bc"), F.sum("c").alias("n_bg"))
    )
    out = wagg.join(bagg, "doc_id", "left")
    dup_frac = F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n")
    top_w = F.col("top_c").cast("double") / F.col("n")
    top_b = F.coalesce(F.col("top_bc").cast("double") / F.col("n_bg"), F.lit(0.0))
    return out.select(
        "doc_id",
        F.round(dup_frac, 6).alias("dup_word_frac"),
        F.round(top_w, 6).alias("top_word_frac"),
        F.round(top_b, 6).alias("top_bigram_frac"),
        ((top_w <= 0.20) & (top_b <= 0.18)).alias("gopher_keep"),
    )


def docs_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set contamination: 4-gram shingle overlap between an eval
    slice (doc_id % 97 == 0) and the training corpus.

    (Production decontamination uses 8-13-grams; the synthetic corpus's
    random word streams only collide at 4-grams, so that is the
    non-vacuous choice here — the plan is n-independent.)

    Shingles carry 8-byte xxhash64 digests, not text (the digest is a
    pure internal equality key — the oracle's own hashing keys the same
    shingle strings, so counts agree independent of hash choice; a long
    shuffles ~4x less than md5's 32-char hex). The eval side is tiny by
    construction and broadcast, so the probe never shuffles the train
    corpus — the canonical decontamination join at 100 TB.
    """
    from pyspark.sql.functions import broadcast

    docs = _docs(spark, sf_dir)
    d = docs.filter(F.size(F.split("text", " ")) >= 4).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    sh = d.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, size(ws)-3),"
            " i -> xxhash64(array_join(slice(ws, i, 4), ' ')))"
        )).alias("sh"),
    )
    ev = sh.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "sh"
    ).distinct()
    tr = sh.filter(F.col("doc_id") % 97 != 0).select(
        F.col("doc_id").alias("train_doc_id"), "sh"
    ).distinct()
    totals = tr.groupBy("train_doc_id").agg(F.count("*").alias("n_sh"))
    ov = (
        tr.join(broadcast(ev), "sh")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return ov.join(totals, "train_doc_id").select(
        "train_doc_id",
        "eval_doc_id",
        "n_overlap",
        F.round(F.col("n_overlap").cast("double") / F.col("n_sh"), 6).alias("overlap_frac"),
    )


def docs_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-passage filtering signal (the ExactSubstr-dedup analog of
    "Deduplicating Training Data Makes Language Models Better"): per
    document, the fraction of its 4-gram passages that also occur in at
    least one OTHER document, plus a keep flag.

    Plan: passage digests → distinct-doc counts (one digest-keyed agg,
    map-side combined) → join back to the per-doc passage stream on the
    digest → per-doc aggregation. Three keyed shuffles, 8-byte xxhash64
    digests only (internal equality key — counts are hash-agnostic, and
    a long shuffles ~4x less than md5 hex) — no passage text moves after
    the scan, nothing is quadratic.
    """
    docs = _docs(spark, sf_dir)
    d = docs.filter(F.size(F.split("text", " ")) >= 4).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    sh = d.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, size(ws)-3),"
            " i -> xxhash64(array_join(slice(ws, i, 4), ' ')))"
        )).alias("sh"),
    )
    freq = sh.groupBy("sh").agg(F.count_distinct("doc_id").alias("nd"))
    joined = sh.join(freq, "sh")
    out = joined.groupBy("doc_id").agg(
        F.count("*").alias("n_passages"),
        F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("n_repeated"),
    )
    frac = F.col("n_repeated").cast("double") / F.col("n_passages")
    return out.select(
        "doc_id", "n_passages", "n_repeated",
        F.round(frac, 6).alias("repeated_frac"),
        (frac <= 0.3).alias("keep_passage"),
    )


def docs_bm25_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 BM25 terms per document (k1=1.2, b=0.75) — the retrieval /
    quality-scoring sibling of :func:`docs_top_terms`.

    Shape: explode(tokens) → (doc, term) counts [shuffle 1] → per-doc
    length from the SAME aggregate [shuffle 2, doc-keyed] → term document
    frequency [shuffle 3, map-combined] → corpus stats (N, total length)
    as a 1-row broadcast — never a driver collect. The doc-length join
    and the rank window share the doc_id key, so AQE coalesces them onto
    one exchange. Ranking is by integers (tf DESC, term ASC) so
    cross-engine float ulps can't reorder it; the BM25 score itself is
    reported rounded.

    Reference scope: beyond-reference op (SURVEY §2.13); the reference
    has no text-retrieval scoring.
    """
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    term = docs.select(
        "doc_id", F.explode(text.tokens("text")).alias("term")
    ).filter(F.col("term") != "")
    tf = term.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df_docs"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    k1, b = 1.2, 0.75
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df_docs") + 0.5) / (F.col("df_docs") + 0.5) + 1.0
    )
    score = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("term").asc())
    return (
        tf.join(dl, "doc_id")
        .join(df_, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id", "term", "tf", "dl", "df_docs",
            F.round(score, 4).alias("bm25"), "rank",
        )
    )


def docs_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style chunking: overlapping 64-token windows, stride 48
    (16-token overlap), with a stable per-chunk fingerprint.

    Pure scan-stage column algebra — ``transform(sequence(...))`` builds
    the window starts, ``slice`` cuts each chunk, one ``explode`` emits
    the rows; no shuffle, no UDF, so at 100 TB this runs at parquet-scan
    speed and parallelism. Trailing chunks may be shorter than the window
    (they are kept: a short tail still carries retrievable content).
    chunk_fp = md5(chunk text) — the join key for chunk-level dedup and
    provenance; md5 because the fingerprint is in the OUTPUT and must
    match the SQL oracle byte-for-byte.
    """
    docs = _docs(spark, sf_dir)
    d = docs.select("doc_id", text.tokens("text").alias("ws")).filter(
        F.size("ws") >= 1
    )
    ch = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws), 48),"
                " s -> struct(s AS start, slice(ws, s, 64) AS chunk))"
            )
        ).alias("c"),
    )
    return ch.select(
        "doc_id",
        ((F.col("c.start") - 1) / 48).cast("int").alias("chunk_ord"),
        F.col("c.start").alias("start_token"),
        F.size("c.chunk").alias("n_tokens"),
        F.md5(F.array_join("c.chunk", " ")).alias("chunk_fp"),
    )


def docs_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) dedup clusters: cosine near-dup pairs
    (sim ≥ 0.35, GEMM-pruned + exact verify) → connected components →
    canonical representative per cluster (min vec_id).

    The end-to-end semantic-dedup flow a training pipeline runs: X5's
    pair generation feeds X22's clustering, and the keep decision is
    ``vec_id == component``. Deterministic, so even the iterative
    component step has an exact recursive-CTE oracle. Scale shape: pair
    generation is blocked GEMM (never all-pairs), label propagation
    shuffles (node, label) pairs only.
    """
    from etl_spark.operators.graph import connected_components

    emb = _emb(spark, sf_dir)
    pairs = similarity.cosine_pairs_fast(emb, threshold=0.35).select("id_a", "id_b")
    comp = connected_components(
        emb.select("vec_id"), pairs, id_col="vec_id", src_col="id_a", dst_col="id_b"
    )
    return comp.select(
        "vec_id",
        "component",
        (F.col("vec_id") == F.col("component")).alias("is_canonical"),
    )


def docs_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring from a self-trained unigram LM
    (the CCNet-shape filter: score each document by the average negative
    log-probability of its tokens under corpus statistics; low = fluent /
    in-distribution, high = noise).

    Shape: token explode → (doc, term) counts [shuffle 1] → term corpus
    counts [shuffle 2, map-combined] joined back onto the term table
    (vocabulary-sized — AQE broadcasts it while it fits) → per-doc
    aggregation [shuffle 3, doc-keyed]. Corpus total rides a 1-row
    broadcast. Float-sum determinism: each term's contribution
    ``tf · ln(N / cnt)`` is rounded to 6 decimals and summed as
    DECIMAL(28,6) — exact, order-independent, engine-portable — then the
    average divides in double. All values are ≥ 0, so Spark HALF_UP and
    DuckDB half-away rounding agree.
    """
    docs = _docs(spark, sf_dir)
    term = docs.select(
        "doc_id", F.explode(text.tokens("text")).alias("term")
    ).filter(F.col("term") != "")
    tf = term.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    cnt = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = cnt.agg(F.sum("cnt").alias("n_total"))
    contrib = F.round(
        F.col("tf") * F.log(F.col("n_total").cast("double") / F.col("cnt")), 6
    ).cast("decimal(28,6)")
    scored = (
        tf.join(cnt, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(contrib).alias("neg_logprob_sum"),
        )
    )
    avg = F.col("neg_logprob_sum").cast("double") / F.col("n_tokens")
    return scored.select(
        "doc_id",
        "n_tokens",
        F.round(avg, 6).alias("avg_neg_logprob"),
        (avg <= 8.0).alias("keep_lm"),
    )


def sample_reservoir_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-stratum sampling (reservoir-k analog): exactly
    min(k, |stratum|) documents per language, k=25 — the other half of
    the training-data mixing toolkit next to rate-based
    :func:`sample_stratified` (fixed budgets per source instead of
    rates).

    Deterministic reservoir: rank documents inside each stratum by the
    md5-uniform of doc_id (a random permutation both engines compute
    identically) and keep rank ≤ k. The rank-filter compiles to
    WindowGroupLimit, so each map task keeps only its local top-k before
    the single stratum-keyed shuffle — at 100 TB the shuffle carries
    O(k × strata × tasks) rows, not the corpus.
    """
    from pyspark.sql import Window

    k = 25
    docs = _docs(spark, sf_dir)
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast(
        "long"
    )
    w = Window.partitionBy("lang").orderBy(u.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "lang", "rank")
    )


def docs_exact_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT token-set Jaccard ≥ 0.9 pairs via prefix filtering
    (:func:`etl_spark.operators.dedup.jaccard_prefix_join`) — the
    exact-threshold complement to the approximate MinHash-LSH pass, at
    the same no-all-pairs scale shape. Threshold 0.9: the synthetic corpus
    is heavily templated (~90k pairs at 0.5 over 500 docs); 0.9 keeps the
    gate output ~10k rows AND exercises the aggressive-prefix regime
    (prefix length ≈ 0.1·|doc| + 1) where the filter earns its keep.

    ``emit='pairs'`` is the OPT-IN audit form (output Ω(#pairs), ~k² per
    group of k identical texts — the one output-bound non-finisher of the
    r9 100× stress); the operator's safe DEFAULT is the linear
    ``emit='clusters'`` form gated as :func:`docs_exact_jaccard_clusters`."""
    out = dedup.jaccard_prefix_join(_docs(spark, sf_dir), threshold=0.9,
                                    emit="pairs")
    return out.select(
        "id_a", "id_b", "inter", "union_", F.round("jaccard", 6).alias("jaccard")
    )


def docs_exact_jaccard_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEFAULT (linear-output) form of the exact set-similarity join:
    one row per document with the smallest doc id reachable through
    token-set Jaccard ≥ 0.9 (connected components over the verified
    distinct-set pair graph). Identical token sets are ONE graph node, so
    a duplicate-heavy corpus grows this output linearly where the pair
    form grows ~k² per clique — this is the form that finishes the 100×
    stress and the one a 100 TB dedup pipeline should consume
    ("keep rep_id, drop the rest")."""
    out = dedup.jaccard_prefix_join(_docs(spark, sf_dir), threshold=0.9)
    return out.select("doc_id", "rep_id")


def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted mixture sampling — the closed-loop version of
    :func:`sample_stratified`: per-language keep rates are COMPUTED from
    the corpus (w_l ∝ c_l^0.5, the α=0.5 temperature smoothing used to
    up-weight low-resource languages in pretraining mixes), targeting
    N=200 docs total, then applied as a deterministic md5-uniform keep.

    Determinism across engines is exact-integer: with m = 52-bit
    md5-uniform numerator, fs_l = floor(sqrt(c_l)) and S = Σ fs_l, keep
    iff ``m·S·c_l < N·fs_l·2^52`` — DECIMAL(38,0) on the Spark side,
    HUGEINT in the oracle, so no float rate ever feeds a boundary
    comparison (a rate computed as a double could flip a keep decision
    by one ulp between engines).

    Scale shape: the per-lang count agg is map-side combined; the rate
    table is |langs| rows joined back unhinted (AQE broadcasts it); the
    keep predicate is scan-stage column algebra.
    """
    n_target = 200
    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("lang").agg(F.count("*").alias("c"))
    fs = counts.withColumn("fs", F.floor(F.sqrt(F.col("c"))))
    tot = fs.agg(F.sum("fs").alias("s_tot"))
    rates = fs.crossJoin(F.broadcast(tot))
    m = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
    ).cast("decimal(20,0)")
    lhs = m * F.col("s_tot").cast("decimal(10,0)") * F.col("c").cast("decimal(12,0)")
    rhs = (
        F.lit(n_target).cast("decimal(10,0)")
        * F.col("fs").cast("decimal(10,0)")
        * F.lit(1 << 52).cast("decimal(20,0)")
    )
    return (
        docs.select("doc_id", "lang")
        .join(rates, "lang")
        .filter(lhs < rhs)
        .select("doc_id", "lang")
    )


def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash dedup: the NEW quarter of the corpus
    (doc_id % 4 == 0) deduped against the standing three quarters plus
    itself — old×old pairs are never generated
    (:func:`etl_spark.operators.dedup.minhash_lsh_incremental`)."""
    docs = _docs(spark, sf_dir)
    new = docs.filter(F.col("doc_id") % 4 == 0)
    old = docs.filter(F.col("doc_id") % 4 != 0)
    out = dedup.minhash_lsh_incremental(old, new, threshold=0.3)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def corpus_drop_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation provenance: one verdict per document explaining WHY it
    left (or stayed in) the curated corpus — the governance/debugging
    ledger every production curation pipeline keeps next to its output.

    Verdict = first matching rule in pipeline order (mirroring
    :func:`corpus_curation` exactly): ``exact_dup`` (not the min doc of
    its content-fingerprint group) → ``near_dup`` (larger id of a
    verified MinHash pair ≥ 0.5) → ``low_quality`` (rounded score < 0.5)
    → ``lang_downsample`` (md5-uniform ≥ the language's rate) →
    ``kept``. Flags arrive as left-join markers; the CASE is scan-stage.
    """
    docs = _docs(spark, sf_dir)
    keepers = dedup.exact_duplicates(docs).select(
        F.col("min_doc_id").alias("doc_id"), F.lit(True).alias("is_keeper")
    )
    near = (
        dedup.minhash_lsh(docs, threshold=0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("is_near_dup", F.lit(True))
    )
    q = text.quality_score(docs).select(
        "doc_id", F.round("quality", 6).alias("quality")
    )
    rates = {"en": 0.5, "de": 0.25, "es": 0.25, "fr": 0.1, "zh": 0.1}
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast(
        "double"
    ) / F.lit(float(1 << 52))
    rate = F.lit(None).cast("double")
    for lang, r in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    verdict = (
        F.when(F.col("is_keeper").isNull(), F.lit("exact_dup"))
        .when(F.col("is_near_dup"), F.lit("near_dup"))
        .when(F.col("quality") < 0.5, F.lit("low_quality"))
        .when(u >= rate, F.lit("lang_downsample"))
        .otherwise(F.lit("kept"))
    )
    return (
        docs.select("doc_id", "lang")
        .join(keepers, "doc_id", "left")
        .join(near, "doc_id", "left")
        .join(q, "doc_id")
        .select("doc_id", "lang", "quality", verdict.alias("verdict"))
    )


def ann_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes (4 subspaces × label-derived codebooks)
    for every embedding — the IVF-PQ compression step
    (:func:`etl_spark.operators.similarity.pq_codes`)."""
    out = similarity.pq_codes(_emb(spark, sf_dir), m=4, dim=64)
    return out.select(
        "vec_id", "code_0", "code_1", "code_2", "code_3", "recon_err"
    )


def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-5 over PQ codes for the first 10 vectors as queries — the
    search half of IVF-PQ: corpus scanned as codes, per-query lookup
    tables broadcast (:func:`etl_spark.operators.similarity.pq_adc_topk`)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.pq_adc_topk(emb, queries, m=4, k=5, dim=64)


def docs_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style column profiler: one stats row per column of the
    documents table — row/null/distinct counts, min/max (rendered as
    strings), mean rendered length. The data-profiling pass a pipeline
    runs before trusting a new input drop.

    Shape: ONE aggregation computes every column's stats (count-distincts
    expand map-side), then a literal-array explode melts the single stats
    row — no per-column scans. At 100 TB the exact distincts swap to
    ``approx_count_distinct`` (HLL, mergeable); exact here so the oracle
    hash-matches.
    """
    docs = _docs(spark, sf_dir)
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        sc = F.col(c).cast("string")
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            # min/max on the NATIVE type, rendered to string after — a
            # string-cast-first min would order numerics lexicographically
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            F.round(F.avg(F.length(sc)), 6).alias(f"__len_{c}"),
        ]
    row = docs.agg(*aggs)
    melted = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("__n").alias("n_rows"),
                        (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                        F.col(f"__nd_{c}").alias("n_distinct"),
                        F.col(f"__min_{c}").alias("min_val"),
                        F.col(f"__max_{c}").alias("max_val"),
                        F.col(f"__len_{c}").alias("avg_len"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return melted.select("p.*")


def docs_boilerplate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate coverage per document (X165): the token-position
    fraction covered by 3-gram shingles that repeat across ≥3 DISTINCT
    documents — the shingle-granularity analog of RefinedWeb/CCNet's
    line-level boilerplate strip (this corpus has no line structure, so
    the repeated-unit is the shingle, and coverage is an exact interval
    union over token positions, not a shingle count). A document mostly
    assembled from cross-document repeated fragments gets ``keep=false``
    even when no whole-document dedup pair fires — the filter decision
    the novelty metric (docs_ngram_novelty) only scores.

    Shuffle algebra: positional shingles explode in the scan stage;
    cross-doc spread is one digest-keyed agg over DISTINCT (doc,
    shingle) [16-byte md5 keys — shingle text never shuffles twice];
    the coverage join fans each BOILERPLATE occurrence to its ≤3
    positions (bounded), then one doc-keyed distinct-count. Work is
    O(tokens + boilerplate occurrences · k) — linear, no windows, no
    self-join.
    """
    docs = _docs(spark, sf_dir)
    toks = text.tokens("text")
    n = F.size(toks)
    idxs = F.when(n >= 3, F.sequence(F.lit(0), n - 3)).otherwise(
        F.array().cast("array<int>"))
    pos = docs.select(
        "doc_id",
        F.explode(
            F.transform(idxs, lambda i: F.struct(
                F.unhex(F.md5(F.concat_ws(" ", F.slice(toks, i + 1, 3))))
                .alias("dig"),
                i.alias("p"),
            ))
        ).alias("s"),
    ).select("doc_id", "s.dig", "s.p")
    # r13 optimization (guide §5): both the spread branch and the coverage
    # join consume `pos`; without the cut the tokenize+md5 explode runs
    # twice (once per branch). Materializing the 24-byte (doc, dig, p)
    # rows once is cheaper than a second full hash pass (measured ~1.6×
    # at sf0.1); the checkpointed frame is digest+position only — shingle
    # text never materializes.
    pos = pos.localCheckpoint(eager=True)
    spread = (
        pos.select("doc_id", "dig").distinct()
        .groupBy("dig").agg(F.count("*").alias("n_docs"))
    )
    boiler = spread.filter(F.col("n_docs") >= 3).select("dig")
    covered = (
        pos.join(boiler, "dig")
        .select("doc_id", F.explode(
            F.sequence(F.col("p"), F.col("p") + 2)).alias("cp"))
        .distinct()
        .groupBy("doc_id").agg(F.count("*").alias("n_covered"))
    )
    base = docs.select("doc_id", F.size(toks).alias("n_tokens"))
    return (
        base.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_covered", F.lit(0)).cast("long").alias("n_covered"),
            F.round(
                F.coalesce("n_covered", F.lit(0)) / F.col("n_tokens"), 6
            ).alias("covered_frac"),
            (F.coalesce("n_covered", F.lit(0)) / F.col("n_tokens") < 0.5)
            .alias("keep"),
        )
    )


def docs_profile_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-backed column profiler (X163): the documented 100-TB
    swap-in for :func:`docs_profile`'s exact distincts, now gate-proven.
    The exact profiler's ``count_distinct`` per column expands map-side
    but still shuffles every distinct value; here each column's
    cardinality comes from a 64-register HLL built in the same single
    pass — the shuffle carries at most ``columns × 64`` register rows
    regardless of data volume, and per-partition register tables merge
    by max (the partition-wise profiling property a warehouse needs).

    One scan: the row melts to (column, value) pairs (bounded ×5 — the
    same expansion the exact profiler's count-distinct does internally),
    registers build per column, and null/row counts ride the same
    aggregate. The from-scratch registers (operators/sketch.py, shared
    52-bit md5 domain) are bit-identical on both engines, so estimates
    hash-match the oracle exactly.
    """
    from etl_spark.operators.sketch import hll_estimate, hll_registers

    docs = _docs(spark, sf_dir)
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    melted = docs.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(c).cast("string").alias("val"),
                )
                for c in cols
            ])
        ).alias("p")
    ).select("p.*")
    # cut point: the null/row-count agg and the register agg both consume
    # the melt — without it each branch re-scans and re-explodes the
    # corpus (the "one scan" claim would be false at profile scale)
    melted = melted.localCheckpoint(eager=True)
    counts = melted.groupBy("column").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), 1).otherwise(0)).alias("n_null"),
    )
    regs = hll_registers(melted.filter(F.col("val").isNotNull()), "val",
                         ["column"], p=6)
    est = hll_estimate(regs, ["column"], p=6)
    return counts.join(est, "column").select(
        "column",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        "est_distinct",
        "n_zero_registers",
    )


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF-PQ search (nprobe=2 coarse cells, then ADC over codes in
    probed cells only) for the first 10 vectors as queries
    (:func:`etl_spark.operators.similarity.ivfpq_topk`)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ivfpq_topk(emb, queries, m=4, k=5, nprobe=2, dim=64)


def vocab_topk_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction prep (the BPE/tokenizer-training first
    pass): global token frequencies, top-200 by count, each with its rank
    and the CUMULATIVE corpus coverage fraction — the curve that decides
    vocab size ("how many types cover 95% of tokens?").

    Scale shape: token counts are one map-combined shuffle; the global
    top-K compiles to TakeOrderedAndProject (each task keeps a local
    top-K before the single ordered collect — never a corpus-wide sort);
    the cumulative window then runs over K=200 rows only. The corpus
    total rides a 1-row broadcast. Ties break by term ascending so both
    engines rank identically.
    """
    from pyspark.sql import Window

    k = 200
    docs = _docs(spark, sf_dir)
    term = docs.select(F.explode(text.tokens("text")).alias("term")).filter(
        F.col("term") != ""
    )
    cnt = term.groupBy("term").agg(F.count("*").alias("n"))
    total = cnt.agg(F.sum("n").alias("n_total"))
    topk = cnt.orderBy(F.col("n").desc(), F.col("term").asc()).limit(k)
    w = (
        Window.orderBy(F.col("n").desc(), F.col("term").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        topk.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("term").asc())))
        .withColumn("cum_n", F.sum("n").over(w))
        .select(
            "rank",
            "term",
            "n",
            F.round(F.col("cum_n") / F.col("n_total"), 6).alias("cum_coverage"),
        )
    )


def docs_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution: per-document token counts binned into
    power-of-two buckets, with document share and cumulative share — the
    histogram that sizes packing windows and max-sequence-length cutoffs
    before a training run.

    Buckets come from INTEGER bit-length (floor(log2) via base-2 digit
    count), never float log2 — a power-of-two boundary computed through
    libm could land on either side in different engines. One doc-keyed
    count (map-combined), a bucket-keyed agg over |buckets| rows, then
    windows over that tiny table.
    """
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    n_tok = docs.select(
        "doc_id",
        F.size(F.filter(text.tokens("text"), lambda t: t != "")).alias("n_tokens"),
    )
    # floor(log2(n)) for n ≥ 1 as length(base-2 digits) - 1; n = 0 → bucket -1
    bucket = F.when(
        F.col("n_tokens") > 0, F.length(F.conv(F.col("n_tokens"), 10, 2)) - 1
    ).otherwise(F.lit(-1))
    hist = (
        n_tok.withColumn("bucket", bucket.cast("int"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    total = hist.agg(F.sum("n_docs").alias("all_docs"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        hist.crossJoin(F.broadcast(total))
        .withColumn("cum_docs", F.sum("n_docs").over(w))
        .select(
            "bucket",
            F.when(
                F.col("bucket") >= 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), bucket)"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("bucket_lo"),
            "n_docs",
            "total_tokens",
            F.round(F.col("n_docs") / F.col("all_docs"), 6).alias("doc_share"),
            F.round(F.col("cum_docs") / F.col("all_docs"), 6).alias("cum_doc_share"),
        )
    )


def ann_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd k-means iteration over the embeddings (assign to nearest
    per-label centroid; ``moved`` flags drive convergence) —
    :func:`etl_spark.operators.similarity.kmeans_step`."""
    return similarity.kmeans_step(_emb(spark, sf_dir))


def ann_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ candidates (k_cand=20, nprobe=2) exact-reranked to top-5 by
    true squared L2 — the FAISS refine pattern
    (:func:`etl_spark.operators.similarity.ivfpq_rerank`)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ivfpq_rerank(emb, queries, m=4, k=5, k_cand=20, nprobe=2, dim=64)


def docs_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency scoring (the KenLM-filter shape one order up
    from :func:`docs_unigram_logprob`): each document scored by the
    average negative log of its bigrams' corpus conditional probability
    ``P(w2|w1) = c(w1 w2) / c(w1·)`` with add-one smoothing over the
    corpus bigram vocabulary — repeated boilerplate scores low (fluent),
    scrambled text scores high.

    Shape: one scan builds per-doc bigram lists (scan-stage
    ``transform`` over the token array — no second explode pass), then
    (doc, bigram) counts [shuffle 1], corpus bigram counts [shuffle 2,
    map-combined], left-context totals [shuffle 3, map-combined, output
    |vocab| rows], joins back (AQE broadcasts the vocabulary-sized
    sides), and a doc-keyed aggregation. Same float policy as the
    unigram op: per-bigram contribution rounds to 6 decimals and sums as
    DECIMAL(28,6) — exact, order-independent, engine-portable.
    """
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.filter(text.tokens("text"), lambda t: t != "").alias("ts")
    )
    # bigrams as "w1\x1fw2" strings: slice+zip_with in the scan stage
    big = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("ts", 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                F.slice("ts", 2, F.greatest(F.size("ts") - 1, F.lit(0))),
                lambda a, b: F.concat_ws("\x1f", a, b),
            )
        ).alias("bg"),
    )
    tf = big.groupBy("doc_id", "bg").agg(F.count("*").alias("tf"))
    cnt = tf.groupBy("bg").agg(F.sum("tf").alias("cbg"))
    left = cnt.withColumn("w1", F.split("bg", "\x1f").getItem(0))
    ctx = left.groupBy("w1").agg(F.sum("cbg").alias("cw1"))
    vsize = cnt.agg(F.count("*").alias("v"))
    # add-one smoothing: P = (c(w1w2) + 1) / (c(w1.) + V)
    contrib = F.round(
        F.col("tf")
        * -F.log(
            (F.col("cbg") + 1).cast("double") / (F.col("cw1") + F.col("v"))
        ),
        6,
    ).cast("decimal(28,6)")
    scored = (
        tf.join(cnt, "bg")
        .withColumn("w1", F.split("bg", "\x1f").getItem(0))
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vsize))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum(contrib).alias("neg_logprob_sum"),
        )
    )
    avg = F.col("neg_logprob_sum").cast("double") / F.col("n_bigrams")
    return scored.select(
        "doc_id",
        "n_bigrams",
        F.round(avg, 6).alias("avg_neg_logprob"),
        (avg <= 5.0).alias("keep_lm"),
    )


def docs_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language calibration of the heuristic quality score: the
    percentile ladder (p10/p25/p50/p75/p90) plus the keep count and rate
    at a global 0.5 cutoff — the table that decides whether one threshold
    fits all languages or per-language cutoffs are needed (the FineWeb /
    CCNet filter-calibration step).

    Shape: the quality features are scan-stage column algebra
    (:func:`etl_spark.operators.text.quality_score`); one |langs|-keyed
    aggregation computes the exact percentile ladder and keep stats
    map-combined. Exact percentiles interpolate identically to the
    oracle's quantile_cont; swap to approx_percentile at 100 TB.
    """
    scored = text.quality_score(_docs(spark, sf_dir)).select(
        "lang", F.col("quality").cast("double").alias("q")
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            *[
                F.round(F.percentile("q", p / 100.0), 6).alias(f"p{p}")
                for p in (10, 25, 50, 75, 90)
            ],
            F.sum((F.col("q") >= 0.5).cast("long")).alias("n_keep"),
        )
        .withColumn("keep_rate", F.round(F.col("n_keep") / F.col("n_docs"), 6))
    )


def docs_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of its distinct 3-word shingles
    that have NEVER appeared in an earlier document (doc_id order) — the
    streaming-corpus "new information density" metric that separates
    genuinely fresh content from recombined boilerplate (near-zero
    novelty = the document is stitched from seen fragments even if no
    single dedup pair fires).

    Shape: distinct shingles per doc (scan-stage explode), a
    shingle-keyed min(doc_id) aggregation (map-combined — the
    first-occurrence index), joined back onto the shingle table (same
    key, same partitioning — AQE reuses the exchange), then a doc-keyed
    count. No windows over the corpus, no self-join; the first-occurrence
    table IS the novelty oracle for any later batch, so the incremental
    form (new batch vs standing index) reuses it unchanged.
    """
    sh = dedup.shingles(_docs(spark, sf_dir), k=3)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    joined = sh.join(first, "shingle")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
                "n_novel"
            ),
        )
        .withColumn(
            "novelty", F.round(F.col("n_novel") / F.col("n_shingles"), 6)
        )
    )


def docs_char_pair_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE first-merge candidates (X96): corpus-wide adjacent
    character-pair frequencies within words — the statistic the first
    byte-pair-encoding merge step maximizes (Sennrich et al. '16,
    tokenizer induction). Top-20 pairs with deterministic (count desc,
    pair asc) tiebreak.

    Scale shape: the pair generation is a scan-stage ``transform`` over
    ``sequence`` (no Python, no join); the count is one map-combined agg
    on a tiny key space (≤26² pairs after lowercasing), and the top-k
    compiles to TakeOrderedAndProject — per-task local top-k, no global
    sort of the corpus. An iterated BPE trainer is this query in a loop
    with the winning pair folded into the token stream.
    """
    docs = read_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


def docs_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality filter rules (X105; Rae et al. '21 §A1.1 —
    the rule family the MassiveText pipeline applies before training):
    per document, word count bounds, mean word length bounds, stopword
    fraction, symbol-to-word ratio ('#' and '...'), and bullet-line
    fraction, folded into one ``keep`` verdict.

    Every metric is an integer count or an integer ratio (exact double
    division), so the verdict hash-matches the SQL oracle bit-for-bit.
    Scale shape: pure scan-stage column algebra — no shuffle, no UDF;
    the split/filter/aggregate all run inside whole-stage codegen.
    """
    from etl_spark.operators.text import LANG_PROFILES, tokens

    stop = sorted({w for ws in LANG_PROFILES.values() for w in ws})
    docs = _docs(spark, sf_dir)
    toks = tokens(F.lower("text"))
    n_words = F.greatest(F.size(toks), F.lit(1))
    word_chars = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*stop)))
    hash_hits = F.length("text") - F.length(F.expr("replace(text, '#', '')"))
    ellipsis_hits = (
        F.length("text") - F.length(F.expr("replace(text, '...', '')"))
    ) / 3
    lines = F.split("text", "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_lines = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
    out = docs.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        F.round(word_chars / n_words, 6).alias("mean_word_len"),
        F.round(stop_hits / n_words, 6).alias("stop_frac"),
        F.round((hash_hits + ellipsis_hits) / n_words, 6).alias("symbol_frac"),
        F.round(bullet_lines / n_lines, 6).alias("bullet_frac"),
    )
    keep = (
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("stop_frac") > 0.02)
        & (F.col("symbol_frac") < 0.1)
        & (F.col("bullet_frac") < 0.9)
    )
    return out.withColumn("keep", keep)


def docs_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (X110; Schleimer et al. SIGMOD'03 —
    the MOSS algorithm): 8-char k-gram hashes, window w=4, select each
    window's RIGHTMOST minimum. The rightmost-min rule rides in one
    window pass via a composite key — ``val = h·2^20 − pos`` makes
    min(val) prefer the smallest hash then the LARGEST position, and
    (h, pos) decode back from val exactly. Output per doc: k-gram count,
    selected-fingerprint count, distinct fingerprints, and an
    order-independent integer checksum of the distinct fingerprint set
    (what a plagiarism/dedup index stores per document).

    Scale shape (r13 optimization, guide §2.4): the whole selection is
    per-document, so it runs SCAN-LOCAL as array algebra — k-gram hashes
    via ``transform`` over a position ``sequence``, the w=4 rightmost-min
    via a 4-element ``slice``+``array_min`` per window, and the distinct
    sets / checksum via ``array_distinct``/``aggregate`` — emitting ONE
    row per document with zero shuffles. The previous shape exploded one
    row per character and paid an explode-spread Exchange, a per-doc
    window Exchange+Sort, and the distinct/agg exchanges on that
    char-sized stream (4 Exchanges → 0; plans/r13). Hashes are the same
    32-bit slices of the shared md5 domain, bit-for-bit.
    """
    docs = _docs(spark, sf_dir).filter(F.length("text") >= 11)
    # val[i] = h(i)·2^20 − i packs (hash asc, pos desc) into one orderable
    # long, exactly as before; window w covers positions p−3..p (1-based
    # slice start p−2), defined for p ≥ 3.
    vals = F.expr(
        "transform(sequence(0, length(text) - 8), i -> "
        " cast(conv(substring(md5(substring(text, i + 1, 8)), 1, 13), 16, 10)"
        "      as bigint) % 4294967296 * 1048576 - i)"
    )
    sel = F.expr(
        "array_distinct(transform(sequence(3, n - 8), p -> "
        " array_min(slice(__vals, p - 2, 4))))"
    )
    fps = F.expr(
        "array_distinct(transform(__sel, v -> "
        " cast(floor((v + 1048575) / 1048576) as bigint)))"
    )
    return (
        docs.select("doc_id", F.length("text").alias("n"), vals.alias("__vals"))
        .select("doc_id", "n", sel.alias("__sel"))
        .select(
            "doc_id",
            "n",
            F.size("__sel").alias("n_sel"),
            fps.alias("__fps"),
        )
        .select(
            "doc_id",
            (F.col("n") - 7).cast("long").alias("n_kgrams"),
            F.col("n_sel").cast("long").alias("n_selected"),
            F.size("__fps").cast("long").alias("n_distinct_fp"),
            F.expr(
                "aggregate(__fps, cast(0 as bigint), (acc, x) -> acc + x)"
            ).alias("fp_checksum"),
        )
    )


def docs_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (X112): the first step of
    every training-data pipeline — a salted-hash bucket of the document
    key (never random(): reruns, backfills, and late-arriving shards must
    land each doc in the SAME split). 90/5/5 by ``h52('split:'||doc_id)
    mod 100``, then per (split, lang) audit rows: doc count, total chars,
    and an order-independent doc_id checksum so two engines can prove the
    MEMBERSHIP is identical, not just the sizes.

    Scale shape: one map-combined groupBy over (split, lang) — the hash
    is computed in the scan stage, no pre-shuffle, output bounded by
    3·|langs|. At 100 TB the same expression tags every shard
    independently (embarrassingly parallel), which is the whole point of
    hash-splitting over sampling.
    """
    docs = _docs(spark, sf_dir)
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit("split"), F.col("doc_id").cast("string"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    bucket = F.pmod(h, F.lit(100))
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("doc_id").alias("docid_checksum"),
        )
    )


def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (X116; Xie et al. '23, "Data
    Selection for Language Models via Importance Resampling"): score every
    document by the log-likelihood ratio of its hashed unigram features
    under a TARGET distribution (here the English subcorpus) vs the RAW
    corpus — the standard recipe for steering a 100 TB crawl toward a
    curated domain without training a classifier.

    Shape: tokens hash into 256 buckets in the scan stage; the two
    feature distributions are map-combined groupBys over a 256-row key
    space; the per-bucket log-ratio table (256 rows, add-1 smoothed) is
    BROADCAST back onto the (doc, bucket) term frequencies, and the
    per-doc weight is one doc-keyed agg. Float-sum determinism: each
    bucket's contribution ``tf · round(logλ(b), 6)`` accumulates in
    DECIMAL(28,6) (order-independent, engine-portable); logλ itself is a
    double computed from exact integer counts, so both engines agree
    bit-for-bit.
    """
    docs = _docs(spark, sf_dir)
    term = docs.select(
        "doc_id",
        "lang",
        F.explode(text.tokens("text")).alias("term"),
    ).filter(F.col("term") != "")
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 13), 16, 10).cast("long")
        % F.lit(256)
    ).cast("int")
    tb = term.select("doc_id", "lang", bucket.alias("b"))
    tf = tb.groupBy("doc_id", "b").agg(F.count("*").alias("tf"))
    raw = tb.groupBy("b").agg(F.count("*").alias("raw_cnt"))
    tgt = (
        tb.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count("*").alias("tgt_cnt"))
    )
    tots = tb.agg(
        F.count("*").alias("raw_tot"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("tgt_tot"),
    )
    ratio = (
        raw.join(tgt, "b", "left")
        .na.fill({"tgt_cnt": 0})
        .crossJoin(F.broadcast(tots))
        .select(
            "b",
            F.round(
                F.log(
                    (F.col("tgt_cnt") + 1).cast("double")
                    / (F.col("tgt_tot") + 256).cast("double")
                )
                - F.log(
                    (F.col("raw_cnt") + 1).cast("double")
                    / (F.col("raw_tot") + 256).cast("double")
                ),
                6,
            ).alias("loglam"),
        )
    )
    scored = (
        tf.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(
                F.round(F.col("tf") * F.col("loglam"), 6).cast("decimal(28,6)")
            ).alias("logweight_sum"),
        )
    )
    lw = F.col("logweight_sum").cast("double")
    return scored.select(
        "doc_id",
        "n_tokens",
        F.round(lw, 6).alias("logweight"),
        F.round(lw / F.col("n_tokens"), 6).alias("logweight_per_token"),
    )


def embeddings_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding covariance matrix (X120): the distributed half of
    PCA/whitening — Σxᵢxⱼ and Σxᵢ accumulated across the corpus, covariance
    assembled from the exact sums. At 100 TB THIS is the hard part (the
    d×d eigensolve is metadata-sized driver work); the whole reduction is
    map-combined into a d(d+1)/2-bounded key space, so executors ship
    partial sums, never rows.

    Determinism: per-row products round half-away-from-zero at 9 dp and
    accumulate as 1e9-SCALED int64 partials inside the Arrow batch —
    bit-exact integer math, order-independent, identical to the oracle's
    round→DECIMAL(38,9) sums. This is the deliberate Pandas-UDF fast
    path: a JVM ``transform``/``slice`` fan-out (the first version)
    shuffles n·d(d+1)/2 struct rows, while numpy's X^T X collapses each
    Arrow batch to ONE d×d partial — measured 6.8s → sub-second at
    sf0.1, and 10× data now costs 10× map work with constant shuffle.
    """
    emb = _emb(spark, sf_dir).select(
        F.col("embedding").cast("array<double>").alias("e")
    )
    d = len(emb.head()["e"])  # one-row probe; d is schema metadata

    def partials(batches):
        import numpy as np
        import pandas as pd

        ii, jj = np.triu_indices(d)
        acc = np.zeros(len(ii), dtype=np.int64)   # Σ round(x_i·x_j, 9)·1e9
        lin = np.zeros(d, dtype=np.int64)         # Σ round(x_i, 9)·1e9
        n = 0
        for pdf in batches:
            X = np.asarray(pdf["e"].tolist(), dtype=np.float64)
            if X.size == 0:
                continue
            n += X.shape[0]
            # per-ROW products rounded half-away at 9dp, then integer-
            # summed — exactly the oracle's round→DECIMAL semantics
            # (np.round is banker's; floor(|p|·1e9 + 0.5) is half-away)
            prods = np.einsum("ni,nj->nij", X, X)[:, ii, jj]
            acc += (np.sign(prods) * np.floor(np.abs(prods) * 1e9 + 0.5)).astype(
                np.int64
            ).sum(axis=0)
            lin += (np.sign(X) * np.floor(np.abs(X) * 1e9 + 0.5)).astype(
                np.int64
            ).sum(axis=0)
        out = pd.DataFrame(
            {
                "i": np.concatenate([ii, np.arange(d)]),
                "j": np.concatenate([jj, np.full(d, -1)]),
                "s9": np.concatenate([acc, lin]),
                "c": np.full(len(ii) + d, n, dtype=np.int64),
            }
        )
        yield out

    terms = emb.mapInPandas(partials, "i int, j int, s9 long, c long")
    # final reduce over #partitions × (d(d+1)/2 + d) partial rows —
    # metadata-sized; decimal division restores the 9-dp scale exactly
    agg = (
        terms.groupBy("i", "j")
        .agg(
            (F.sum("s9").cast("decimal(38,9)") / F.lit(10**9)).alias("s"),
            F.sum("c").alias("c"),
        )
        .localCheckpoint()
    )
    sxy = agg.filter(F.col("j") >= 0).select("i", "j", F.col("s").alias("sxy"))
    dims = agg.filter(F.col("j") == -1).select(
        "i", F.col("s").cast("decimal(28,9)").alias("sx"), F.col("c").alias("n")
    )
    di = dims.select(
        F.col("i"), (F.col("sx").cast("double") / F.col("n")).alias("mu_i"), "n"
    )
    dj = dims.select(
        F.col("i").alias("j"), (F.col("sx").cast("double") / F.col("n")).alias("mu_j")
    )
    return (
        sxy.join(F.broadcast(di), "i")
        .join(F.broadcast(dj), "j")
        .select(
            "i",
            "j",
            F.round(
                F.col("sxy").cast("double") / F.col("n")
                - F.col("mu_i") * F.col("mu_j"),
                9,
            ).alias("cov"),
        )
    )


def embeddings_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit (X124): per-dimension scale
    (max |x| / 127), quantization MSE, and saturation count — the
    compression pass that turns a 100 TB float32 embedding store into a
    quarter the bytes before ANN serving, plus the error report that
    says whether it was safe.

    Shape: one posexplode fan-out, ONE map-combined pass for the scales
    (d-bounded), scales broadcast back for the error pass; round-trip
    error per element rounds→DECIMAL so the per-dim MSE is
    order-independent. The quantized value itself — round-half-away to
    int, clamped to ±127 — is integer-exact on both engines.
    """
    emb = _emb(spark, sf_dir).select(
        F.col("embedding").cast("array<double>").alias("e")
    )
    elems = emb.select(F.posexplode("e").alias("i", "x"))
    scales = elems.groupBy("i").agg(
        (F.max(F.abs(F.col("x"))) / 127.0).alias("scale"),
        F.count("*").alias("n"),
    )
    q = (
        elems.join(F.broadcast(scales), "i")
        .withColumn(
            "qv",
            F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.round(F.col("x") / F.col("scale")).cast("int")),
            ),
        )
        .withColumn("err", F.col("x") - F.col("qv") * F.col("scale"))
    )
    return q.groupBy("i").agg(
        F.round(F.first("scale"), 9).alias("scale"),
        F.round(
            F.sum(F.round(F.col("err") * F.col("err"), 12).cast("decimal(28,12)"))
            .cast("double")
            / F.first("n"),
            12,
        ).alias("mse"),
        F.sum(F.when(F.abs(F.col("qv")) == 127, 1).otherwise(0)).alias("n_saturated"),
    )


def docs_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law slope of the corpus vocabulary (X126): OLS slope of
    ln(freq) on ln(rank) over the top-500 terms — natural corpora sit
    near −1; a flat or broken slope flags synthetic/templated text
    before it poisons a training mix.

    Shape: term counts are one map-combined groupBy (vocab-bounded);
    the top-500 selection is orderBy().limit() — TakeOrderedAndProject,
    per-partition top-k then a bounded merge, never a global sort (a
    no-partition row_number window would single-task the vocabulary;
    WindowGroupLimit only fires for partitioned windows); the rank is
    assigned over the 500-row result. The OLS moments are decimal sums
    of 9-dp-rounded logs. Ties rank by term for engine-identical order.
    """
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    term = docs.select(F.explode(text.tokens("text")).alias("term")).filter(
        F.col("term") != ""
    )
    cnt = term.groupBy("term").agg(F.count("*").alias("cnt"))
    top = cnt.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(500)
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    top = top.withColumn("rnk", F.row_number().over(w))
    lx = F.round(F.log(F.col("rnk").cast("double")), 9)
    ly = F.round(F.log(F.col("cnt").cast("double")), 9)
    m = top.agg(
        F.count("*").alias("n_terms"),
        F.sum(lx.cast("decimal(28,9)")).alias("sx"),
        F.sum(ly.cast("decimal(28,9)")).alias("sy"),
        F.sum(F.round(lx * lx, 9).cast("decimal(38,9)")).alias("sxx"),
        F.sum(F.round(lx * ly, 9).cast("decimal(38,9)")).alias("sxy"),
    )
    n = F.col("n_terms").cast("double")
    slope = (
        (n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / (n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
    )
    return m.select(
        "n_terms",
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / n, 6
        ).alias("intercept"),
    )


def docs_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs (X132): the
    collocation detector ("new york", "machine learning") behind phrase
    vocabularies and tokenizer merges — PMI = ln(n·c(x,y)/(c(x)·c(y)))
    over BIGRAM occurrences, reported for pairs seen ≥ 5 times.

    Shape: the bigram fan-out is position-bounded (one row per adjacent
    pair — the shingle shape, never all-pairs-in-doc); unigram and
    bigram counts are two map-combined groupBys; unigram counts join
    back twice — vocabulary-bounded, broadcast while it fits. Output is
    min-support-pruned, PMI from exact integer counts in double.
    """
    docs = _docs(spark, sf_dir).withColumn("tks", text.tokens("text"))
    # adjacent pairs via the array itself: zip the token list with its own
    # tail — stays in the scan stage, no window, no self-join
    pairs = (
        docs.filter(F.size("tks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(tks, 1, size(tks) - 1), "
                    "slice(tks, 2, size(tks) - 1), "
                    "(a, b) -> struct(a as x, b as y))"
                )
            ).alias("p")
        )
        .select("p.x", "p.y")
    )
    uni = docs.select(F.explode(text.tokens("text")).alias("w")).filter(
        F.col("w") != ""
    ).groupBy("w").agg(F.count("*").alias("cw"))
    big = (
        pairs.filter((F.col("x") != "") & (F.col("y") != ""))
        .groupBy("x", "y")
        .agg(F.count("*").alias("cxy"))
        .filter(F.col("cxy") >= 5)
    )
    n = uni.agg(F.sum("cw").alias("n_tokens"))
    ux = uni.select(F.col("w").alias("x"), F.col("cw").alias("cx"))
    uy = uni.select(F.col("w").alias("y"), F.col("cw").alias("cy"))
    j = (
        big.join(F.broadcast(ux), "x")
        .join(F.broadcast(uy), "y")
        .crossJoin(F.broadcast(n))
    )
    pmi = F.log(
        F.col("cxy") * F.col("n_tokens").cast("double")
        / (F.col("cx").cast("double") * F.col("cy"))
    )
    return j.select("x", "y", "cxy", F.round(pmi, 6).alias("pmi"))


def docs_readability_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch–Kincaid-style readability scoring (X135): grade level from
    words/sentence and syllables/word (vowel-group heuristic — the
    standard proxy when no dictionary ships) — a text-quality feature
    every curation mix wants beside stopword/length filters.

    Shape: pure scan-stage string expressions (regexp counts — no
    explode, no shuffle beyond the _docs spread); sentences = terminal
    punctuation runs (min 1), syllables = vowel groups (min 1/word).
    The score divides exact integer counts in double, rounded 4 dp.
    """
    docs = _docs(spark, sf_dir)
    words = F.size(text.tokens("text"))
    sentences = F.greatest(
        F.expr(r"CAST(regexp_count(text, '[.!?]+') AS INT)"), F.lit(1)
    )
    syllables = F.greatest(
        F.expr(r"CAST(regexp_count(lower(text), '[aeiouy]+') AS INT)"), words
    )
    grade = (
        0.39 * words.cast("double") / sentences
        + 11.8 * syllables.cast("double") / words
        - 15.59
    )
    return docs.select(
        "doc_id",
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
        F.round(grade, 4).alias("fk_grade"),
    ).filter(F.col("n_words") > 0)


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall@5 evaluation (X137): the approximate index's quality
    gate — per query, how much of the EXACT cosine top-5 the LSH index
    recovers. Every ANN deployment runs this eval before trusting the
    index; here it composes two registered operators (brute-force
    cosine as ground truth, bucketed LSH as the candidate) and both
    sides carry exact oracles, so the recall itself is exact.

    Shape: two k·|queries|-bounded frames joined on (query, neighbor) —
    everything downstream of the component operators is metadata-sized.
    """
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "vec_id")
    approx = ann_lsh_topk(spark, sf_dir).select(
        F.col("query_id").alias("aq"), F.col("vec_id").alias("av")
    )
    hits = exact.join(
        approx,
        (F.col("query_id") == F.col("aq")) & (F.col("vec_id") == F.col("av")),
        "left",
    )
    return hits.groupBy("query_id").agg(
        F.count("*").alias("n_exact"),
        F.sum(F.when(F.col("av").isNotNull(), 1).otherwise(0)).alias("n_hit"),
        F.round(
            F.sum(F.when(F.col("av").isNotNull(), 1).otherwise(0))
            / F.count("*").cast("double"),
            6,
        ).alias("recall"),
    )


def corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth (X148): V(n) ≈ K·n^β — how fast new
    vocabulary appears as the corpus grows in doc_id order, with the
    log-log OLS slope β (natural corpora sit near 0.5; β drifting up
    mid-ingest flags encoding noise, down flags templated text). The
    curve itself is the per-doc (cumulative tokens, cumulative distinct
    vocabulary) table.

    Exact cumulative DISTINCT without a quadratic re-scan: a term's
    FIRST occurrence is a groupBy-min over the term table (one
    map-combined shuffle); cumulative vocabulary = running sum of
    first-occurrence counts over the DOC-bounded per-doc table, beside
    the running token count — two values per doc, one bounded window.
    OLS moments are decimal sums of 9-dp logs over ≤|docs| points.
    """
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    term = docs.select(
        "doc_id", F.explode(text.tokens("text")).alias("term")
    ).filter(F.col("term") != "")
    per_doc = term.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    firsts = (
        term.groupBy("term")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_new_terms"))
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        per_doc.join(firsts, "doc_id", "left")
        .na.fill({"n_new_terms": 0})
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn("cum_vocab", F.sum("n_new_terms").over(w))
    )
    lx = F.round(F.log(F.col("cum_tokens").cast("double")), 9)
    ly = F.round(F.log(F.col("cum_vocab").cast("double")), 9)
    m = curve.agg(
        F.count("*").alias("n_docs"),
        F.max("cum_tokens").alias("total_tokens"),
        F.max("cum_vocab").alias("vocab_size"),
        F.sum(lx.cast("decimal(28,9)")).alias("sx"),
        F.sum(ly.cast("decimal(28,9)")).alias("sy"),
        F.sum(F.round(lx * lx, 9).cast("decimal(38,9)")).alias("sxx"),
        F.sum(F.round(lx * ly, 9).cast("decimal(38,9)")).alias("sxy"),
    )
    n = F.col("n_docs").cast("double")
    beta = (
        (n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / (n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
    )
    return m.select(
        "n_docs",
        "total_tokens",
        "vocab_size",
        F.round(beta, 6).alias("heaps_beta"),
        F.round(
            F.exp((F.col("sy").cast("double") - beta * F.col("sx").cast("double")) / n),
            6,
        ).alias("heaps_k"),
    )


def embeddings_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-centroid separation matrix (X150): squared Euclidean
    distance between every pair of label centroids — the cluster-quality
    report (are classes separable before training a probe?) and the
    IVF-cell-overlap diagnostic for the ANN stack.

    Shape: centroids are per-(label, dim) exact-decimal means (one
    map-combined fan-out — the same order-independent accumulation as
    the k-means step); the pairwise stage self-joins the
    |labels|·d-bounded centroid table on dim and reduces to the
    |labels|²-bounded matrix with rounded-decimal sums.
    """
    emb = _emb(spark, sf_dir).select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    cent = (
        emb.groupBy("label", "pos")
        .agg(
            (
                F.sum(F.round(F.col("v"), 9).cast("decimal(28,9)")).cast("double")
                / F.count("*")
            ).alias("mu")
        )
        .localCheckpoint()  # consumed by both sides of the pair join
    )
    a = cent.select(
        F.col("label").alias("label_a"), "pos", F.col("mu").alias("mu_a")
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        F.col("pos").alias("pos_b"),
        F.col("mu").alias("mu_b"),
    )
    pairs = a.join(
        F.broadcast(b),
        (F.col("pos") == F.col("pos_b")) & (F.col("label_a") < F.col("label_b")),
    )
    d2 = F.round(
        (F.col("mu_a") - F.col("mu_b")) * (F.col("mu_a") - F.col("mu_b")), 9
    ).cast("decimal(38,9)")
    return pairs.groupBy("label_a", "label_b").agg(
        F.round(F.sum(d2).cast("double"), 6).alias("dist_sq"),
        F.round(F.sqrt(F.sum(d2).cast("double")), 6).alias("dist"),
    )


def docs_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (X158): keep the top-10 documents per
    source by quality score — the C4/RefinedWeb-style per-domain cap
    that stops one hot domain from dominating a pretraining mix.

    Skew-safe by construction: at corpus scale source/domain frequencies
    are Zipfian, so a single row_number window would put the hottest
    domain's entire sort in one task. ``salted_topk_per_key`` windows
    over (source, salt) first — any task sorts at most one shard — then
    ranks the <= n_salts*k survivors. Ranking uses the ROUNDED quality
    (6 dp, the gate-proven cross-engine-stable form) tie-broken by
    doc_id, so the order is total and oracle-exact.
    """
    from etl_spark.operators import skew

    scored = text.quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "source", F.round("quality", 6).alias("quality")
    )
    kept = skew.salted_topk_per_key(
        scored,
        keys=["source"],
        order_by=[F.col("quality").desc(), F.col("doc_id").asc()],
        k=10,
        salt_col="doc_id",
    )
    return kept.select("source", "doc_id", "quality", "rank")


def docs_source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Jensen–Shannon divergence vs the corpus-global unigram
    distribution (X159): the domain-shift audit a data-mixing pipeline
    runs before reweighting — a source whose token distribution diverges
    from the mix is over/under-represented.

    Exact-sum formulation: JS(P,Q) = 0.5·Σ p·ln(2p/(p+q))
    + 0.5·Σ q·ln(2q/(p+q)), and every token ABSENT from the source
    contributes 0.5·q·ln2, so only the PRESENT (source, token) join is
    materialized and the absent-token mass folds in as
    0.5·ln2·(1 − Σ_present q) — no |sources| × |vocab| expansion, the
    scale property that matters at a 100 TB vocab. Each term is fixed
    to 9 dp and summed as DECIMAL(38,9) (order-independent exact sum),
    so the result is bit-stable across engines and partitionings.
    """
    toks = _docs(spark, sf_dir).select(
        "source", F.explode(text.tokens("text")).alias("tok")
    ).filter(F.length("tok") > 0)
    per = toks.groupBy("source", "tok").agg(F.count("*").alias("n"))
    # cut point: tokenization is the expensive stage at corpus scale —
    # aggregate (source, tok) → n ONCE, then derive the global unigram
    # counts, per-source totals, and the corpus total by RE-AGGREGATING
    # the checkpointed aggregate (zero extra corpus scans; previously
    # glob + the g_total driver count each re-tokenized the corpus).
    per = per.localCheckpoint(eager=True)
    glob = per.groupBy("tok").agg(F.sum("n").alias("gn"))
    src_tot = per.groupBy("source").agg(F.sum("n").alias("sn"))
    # corpus total as a broadcast 1-row frame, not a driver action
    g_total = per.agg(F.sum("n").cast("double").alias("gt"))

    j = (
        per.join(glob, "tok")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(g_total))
        .withColumn("p", F.col("n") / F.col("sn"))
        .withColumn("q", F.col("gn") / F.col("gt"))
    )
    term = (
        0.5 * F.col("p") * F.log(2.0 * F.col("p") / (F.col("p") + F.col("q")))
        + 0.5 * F.col("q") * F.log(2.0 * F.col("q") / (F.col("p") + F.col("q")))
    )
    dec = F.round(term, 9).cast("decimal(38,9)")
    qdec = F.round(F.col("q"), 9).cast("decimal(38,9)")
    import math

    agg = j.groupBy("source").agg(
        F.sum(dec).alias("present_sum"),
        F.sum(qdec).alias("q_present"),
        F.max("sn").alias("n_tokens_source"),
    )
    js = (
        F.col("present_sum").cast("double")
        + 0.5 * math.log(2.0) * (1.0 - F.col("q_present").cast("double"))
    )
    return agg.select(
        "source",
        F.col("n_tokens_source").cast("long").alias("n_tokens_source"),
        F.round(js, 6).alias("js_div"),
    )


def docs_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicate-rate audit (X160): for each source, how much
    of it is exact-duplicate text (within the source) and how much of
    its content also appears in OTHER sources — the first audit run on
    a new crawl before deciding per-domain caps and dedup strategy.

    Shuffle algebra: one digest-level aggregation (md5 only — text never
    shuffles), one digest→source-count map joined back, one per-source
    fold. All counts are exact integers; the rate is rounded at 6 dp.
    ``n_dup_within`` counts the EXTRA copies inside the source
    (n − distinct); ``n_cross_source`` counts docs whose exact text
    also appears in at least one other source.
    """
    d = _docs(spark, sf_dir).select("source", F.md5("text").alias("dig"))
    per = d.groupBy("source", "dig").agg(F.count("*").alias("n"))
    spread = per.groupBy("dig").agg(F.count("*").alias("n_src"))
    j = per.join(spread, "dig")
    out = j.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        (F.sum("n") - F.count("*")).cast("long").alias("n_dup_within"),
        F.sum(F.when(F.col("n_src") > 1, F.col("n")).otherwise(0))
        .cast("long").alias("n_cross_source"),
    )
    return out.select(
        "source", "n_docs", "n_dup_within", "n_cross_source",
        F.round(F.col("n_dup_within") / F.col("n_docs"), 6).alias("dup_rate"),
    )


def docs_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT directional set-containment ≥ 0.98 pairs (X169) via the
    one-sided prefix-filter join
    (:func:`etl_spark.operators.dedup.containment_prefix_join`): the
    subset-duplication audit — a short doc embedded in a long one has
    Jaccard ≈ |A|/|B| (invisible to the symmetric exact pass) but
    containment 1.0. Threshold 0.98 keeps the templated synthetic
    corpus's output ~22k rows at sf0.01 while exercising the aggressive
    prefix regime (prefix ≈ 0.02·|doc| + 1; at 0.95 the tiny synthetic
    vocabulary admits HALF of all set pairs as candidates — 7.6M exact
    intersects at sf0.1 — so the gate pins the high-threshold regime
    and the operator keeps `threshold` free for real corpora). Directional output is
    inherently pair-bound — the operator carries the pre-counted
    ``max_pairs`` guard for corpora where that's unsafe."""
    return dedup.containment_prefix_join(_docs(spark, sf_dir), threshold=0.98)


def corpus_dedup_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup keep-list (X171): exact Jaccard ≥ 0.9 clusters
    (the linear `emit='clusters'` form) joined with the quality scorer;
    per cluster the KEEPER is the highest-quality member (ties → lowest
    doc_id) — the curation decision real training-data dedup makes
    (keep the best exemplar, not the arbitrary min-id one).

    Scale shape: clusters are linear-output by construction; the keeper
    per cluster is a map-combined `max(struct(quality, -doc_id))`
    aggregate + an equi-join back — NO per-cluster window, so a
    mega-cluster (the duplicate-heavy failure mode) never concentrates
    on one task. Quality ordering uses the 6-decimal-rounded score both
    here and in the oracle, with doc_id as the total tiebreak.
    """
    docs = _docs(spark, sf_dir)
    clusters = dedup.jaccard_prefix_join(docs, threshold=0.9, emit="clusters")
    q = text.quality_score(docs).select(
        "doc_id", F.round("quality", 6).alias("quality"))
    j = clusters.join(q, "doc_id")
    keepers = j.groupBy("rep_id").agg(
        F.max(F.struct(F.col("quality"), (-F.col("doc_id")).alias("nid")))
        .alias("m")
    ).select("rep_id", (-F.col("m.nid")).alias("keep_id"))
    return (
        j.join(keepers, "rep_id")
        .select(
            "doc_id", "rep_id", "quality",
            (F.col("doc_id") == F.col("keep_id")).alias("keep"),
        )
    )


def docs_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical Simpson concentration (X174, round 13):
    D = Σ f·(f−1) / (N·(N−1)) over token frequencies — the probability
    two random tokens from a source coincide. High D = templated/
    repetitive text (the token-level twin of docs_repetition's n-gram
    audit); a curation mix caps or downweights such sources.

    Shape: explode → (source, term) count → per-source aggregate: two
    map-combined shuffles, the intermediate bounded by per-source
    VOCABULARY (not token volume). All sums are integer (exact at any
    partitioning); the single final division is rounded at 9 dp.
    """
    docs = _docs(spark, sf_dir)
    term = docs.select(
        "source", F.explode(text.tokens("text")).alias("term")
    ).filter(F.col("term") != "")
    tf = term.groupBy("source", "term").agg(F.count("*").alias("f"))
    agg = tf.groupBy("source").agg(
        F.sum("f").alias("n_tokens"),
        F.count("*").alias("vocab"),
        F.sum(F.col("f") * (F.col("f") - 1)).alias("s2"),
    )
    return agg.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("vocab").cast("long").alias("vocab"),
        F.round(
            F.col("s2").cast("double")
            / (F.col("n_tokens").cast("double")
               * (F.col("n_tokens").cast("double") - 1.0)), 9
        ).alias("simpson_d"),
    )


def docs_containment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR directional-containment audit (X175, round 13): one row
    per doc whose token set is ≥ 0.98-contained in at least one OTHER
    distinct set — container count, best containment, deterministic
    best-container id. The deployment form of ``docs_containment_dedup``
    (the same pairs→linear move simhash made): the pair form's output is
    inherently Ω(#qualifying pairs) and the measured ×100 probe confirms
    it output-bound (clique members emit k·(k−1) rows — timeout at
    ×100 on the templated corpus), while this form's every stage
    through the verify is distinct-set-bounded and the output is ONE
    row per doc. Same-set exact twins are excluded (dedup_exact's
    domain).
    """
    return dedup.containment_prefix_join(
        _docs(spark, sf_dir), threshold=0.98, emit="audit")


def dedup_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration (X180, round 13): over the LSH
    candidate pairs, compare the 16-hash MinHash resemblance estimate
    (fraction of agreeing seeded minima, Broder '97) against the EXACT
    shingle Jaccard, bucketed by exact-Jaccard decile — the accuracy
    audit that justifies a chosen (num_hashes, bands) operating point
    before a corpus-wide dedup run (the ann_recall_eval discipline
    applied to the dedup family).

    Shape: signatures/bands/candidates are the proven X2 pipeline; the
    estimate is a wide 16-column equality sum on the candidate join (no
    extra shuffle class); per-pair terms are 9-dp-rounded into exact
    decimal sums so the per-decile means hash-match at any partitioning.
    """
    docs = _docs(spark, sf_dir)
    # ONE materialized shingle-set collapse (the minhash_lsh move): the
    # old exploded-shingle path paid the wide 16-min groupBy AND a second
    # explode + collect_set for the verify. Signatures from the set table
    # are value-identical (min over a set = min over its exploded rows).
    par = spark.sparkContext.defaultParallelism
    sets_ = (
        dedup.shingle_sets(docs, k=3)
        .repartition(par)
        .localCheckpoint(eager=True)
    )
    # sig is consumed THREE times (band buckets + both estimate join
    # sides) and each consumer re-ran the 16 array-min signature scan
    # (measured 11.3/8.1/5.6 s of task time for the three copies at
    # sf0.1); the doc-bounded 17-column table is materialized once
    sig = dedup.minhash_signatures_from_sets(sets_, num_hashes=16).localCheckpoint(
        eager=True
    )
    buckets = dedup.lsh_buckets(sig, bands=4, rows_per_band=4)
    pairs = dedup.candidate_pairs(buckets)
    siga = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"h{s}").alias(f"ha{s}") for s in range(16)],
    )
    sigb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"h{s}").alias(f"hb{s}") for s in range(16)],
    )
    est = (
        pairs.join(siga, "id_a")
        .join(sigb, "id_b")
        .select(
            "id_a",
            "id_b",
            sum(
                (F.col(f"ha{s}") == F.col(f"hb{s}")).cast("int")
                for s in range(16)
            ).alias("matches"),
        )
    )
    exact = dedup.ngram_jaccard(pairs, None, sets=sets_)
    j = exact.join(est, ["id_a", "id_b"])
    jac = F.col("jaccard")
    estv = F.col("matches") / F.lit(16.0)
    out = j.groupBy(F.floor(jac * 10).cast("int").alias("jaccard_decile")).agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.round(estv, 9).cast("decimal(38,9)")).alias("se"),
        F.sum(F.round(jac, 9).cast("decimal(38,9)")).alias("sj"),
        F.sum(F.round(F.abs(estv - jac), 9).cast("decimal(38,9)")).alias("serr"),
    )
    n = F.col("n_pairs")
    return out.select(
        "jaccard_decile",
        "n_pairs",
        F.round(F.col("se").cast("double") / n, 6).alias("mean_est"),
        F.round(F.col("sj").cast("double") / n, 6).alias("mean_exact"),
        F.round(F.col("serr").cast("double") / n, 6).alias("mean_abs_err"),
    )


def corpus_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold-calibration curve (X181, round 13): for Jaccard
    thresholds 0.30 … 0.90, how many verified near-dup pairs and how
    many distinct documents would each cutoff implicate? The sweep every
    deployment runs to pick its threshold — computed from ONE
    candidate+verify pass (the threshold is column algebra over the
    verified pairs, never a re-run per cutoff).

    Shape: the verified pair set (bounded by LSH bucket occupancy) is
    checkpointed once; the 7-way threshold explode multiplies only that
    bounded pair table. Thresholds are integer percents so the
    comparison is exact on both engines; mean Jaccard per cutoff uses
    the 9-dp decimal-sum discipline. Zero-pair cutoffs still emit a row
    (n=0, null mean) via the static threshold frame.
    """
    docs = _docs(spark, sf_dir)
    # same materialized shingle-set backbone as dedup_minhash_accuracy
    par = spark.sparkContext.defaultParallelism
    sets_ = (
        dedup.shingle_sets(docs, k=3)
        .repartition(par)
        .localCheckpoint(eager=True)
    )
    sig = dedup.minhash_signatures_from_sets(sets_, num_hashes=16)
    pairs = dedup.candidate_pairs(dedup.lsh_buckets(sig, bands=4, rows_per_band=4))
    verified = (
        dedup.ngram_jaccard(pairs, None, sets=sets_)
        .select("id_a", "id_b", "jaccard")
        .localCheckpoint(eager=False)
    )
    thresholds = [30, 40, 50, 60, 70, 80, 90]
    tall = verified.select(
        "id_a", "id_b", "jaccard",
        F.explode(F.array(*[F.lit(t) for t in thresholds])).alias("t"),
    ).filter(F.col("jaccard") * 100 >= F.col("t"))
    per_t = tall.groupBy("t").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.round(F.col("jaccard"), 9).cast("decimal(38,9)")).alias("sj"),
    )
    docs_t = (
        tall.select("t", F.explode(F.array("id_a", "id_b")).alias("doc"))
        .groupBy("t")
        .agg(F.countDistinct("doc").alias("n_dup_docs"))
    )
    frame = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in thresholds])).alias("t")
    )
    out = (
        frame.join(per_t, "t", "left")
        .join(docs_t, "t", "left")
        .select(
            (F.col("t") / F.lit(100.0)).alias("threshold"),
            F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
            F.coalesce(F.col("n_dup_docs"), F.lit(0)).alias("n_dup_docs"),
            F.round(
                F.col("sj").cast("double")
                / F.coalesce(F.col("n_pairs"), F.lit(0)),
                6,
            ).alias("mean_jaccard"),
        )
    )
    return out


def docs_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source vocabulary-overlap matrix (X183, round 13):
    exact Jaccard between every two sources' distinct token
    vocabularies — the source-similarity audit behind mixing/dedup
    decisions (two near-identical crawls should be down-weighted before
    [[docs_source_js_divergence]]-style reweighting; that op measures
    drift from the global mix, this one measures source-PAIR affinity).

    Shape: ONE corpus scan collapses to the distinct (source, token)
    table (map-combined, checkpointed — the tokenize is the only
    corpus-sized stage); the pair intersection is a self-join ON TOKEN,
    so cost is Σ_tok |sources containing tok|² ≤ vocab·S² — linear in
    vocabulary for a bounded source count, never |docs|². Output is the
    S·(S−1)/2 pair matrix; integer set sizes divide once in double.
    """
    vocab = (
        _docs(spark, sf_dir)
        .select("source", F.explode(text.tokens("text")).alias("tok"))
        .filter(F.length("tok") > 0)
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = vocab.groupBy("source").agg(F.count("*").alias("vsize"))
    a = vocab.select(F.col("source").alias("src_a"), "tok")
    b = vocab.select(F.col("source").alias("src_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.withColumnRenamed("source", "src_a").withColumnRenamed(
        "vsize", "vocab_a"
    )
    sb = sizes.withColumnRenamed("source", "src_b").withColumnRenamed(
        "vsize", "vocab_b"
    )
    j = inter.join(F.broadcast(sa), "src_a").join(F.broadcast(sb), "src_b")
    union = F.col("vocab_a") + F.col("vocab_b") - F.col("inter")
    return j.select(
        "src_a",
        "src_b",
        "vocab_a",
        "vocab_b",
        "inter",
        F.round(F.col("inter") / union, 6).alias("jaccard"),
    )
