"""Deterministic cardinality sketches: KMV (k-minimum-values).

Why not HLL? Spark's ``approx_count_distinct`` and DuckDB's
``approx_count_distinct`` are both HyperLogLog but with different register
layouts — their estimates differ, so cross-engine verification is
impossible. KMV (Bar-Yossef et al. '02) is hash-deterministic: with a
shared hash (md5) both engines compute the SAME k minimum values and
therefore the same estimate — an approximate aggregate with an EXACT
oracle.

Estimator: normalize h(x) to U ≈ uniform(0,1); with the k-th smallest
value u_k over distinct inputs, distinct ≈ (k-1)/u_k. Relative error
~1/sqrt(k-2).

Scale shape: per group, a rank window keeps only the k smallest hashes —
WindowGroupLimit prunes map-side, so the shuffle carries ≤ k rows per
group regardless of input size (the sketch property, in plan form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 16^13 — md5's first 13 hex digits as a fraction of the hash space.
#: 13 digits = 52 bits < 2^53, so the integer is EXACT in a double on every
#: engine — the normalized hash is bit-identical across Spark and DuckDB
#: (15+ digits would round differently per engine's summation path).
HASH_SPACE = float(16**13)


def _uhash(col):
    """Normalized md5 hash in [0,1): first 13 hex digits / 16^13."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast("double") / F.lit(HASH_SPACE)


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """KMV distinct-count estimate per group: ``(groups..., est_distinct,
    kth_min_hash, n_sketch)``.

    ``n_sketch`` < k means the group had fewer than k distinct values — the
    sketch then IS the exact distinct count (est equals it).
    """
    group_cols = group_cols or []
    hashed = df.select(*group_cols, _uhash(F.col(value_col)).alias("__u")).distinct()
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("__u")
    topk = hashed.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    agg = topk.groupBy(*group_cols).agg(
        F.max("__u").alias("kth_min_hash"),
        F.count("*").alias("n_sketch"),
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise((F.lit(k - 1)) / F.col("kth_min_hash"))
    return agg.select(
        *group_cols,
        F.round(est, 4).alias("est_distinct"),
        F.round("kth_min_hash", 12).alias("kth_min_hash"),
        "n_sketch",
    )


def kmv_sketch_rows(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """The raw per-group KMV sketch CONTENT: the k smallest distinct
    uniform hashes per group, ``(groups..., __u)`` — what a warehouse
    PERSISTS per partition/day so estimates merge without rescans."""
    group_cols = group_cols or []
    hashed = df.select(*group_cols, _uhash(F.col(value_col)).alias("__u")).distinct()
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("__u")
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(*group_cols, "__u")
    )


def kmv_merge(sketches: DataFrame, k: int = 64) -> DataFrame:
    """MERGE persisted per-group KMV sketches into ONE estimate — the
    property that makes the sketch warehouse-grade: the global k smallest
    distinct hashes are necessarily contained in the union of per-group
    k-minimums, so the merged estimate EQUALS the estimate of a sketch
    built directly over the union, with no raw-data rescan.

    Input: ``(…, __u)`` rows from :func:`kmv_sketch_rows` (any number of
    groups). The global top-k is a no-partition rank — WindowGroupLimit
    keeps k rows per map task, so the single-task reduce sees
    O(k × tasks), never the sketch union. Returns one row
    ``(est_distinct, kth_min_hash, n_sketch)``.
    """
    u = sketches.select("__u").distinct()
    w = Window.orderBy("__u")
    topk = u.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    agg = topk.agg(
        F.max("__u").alias("kth_min_hash"), F.count("*").alias("n_sketch")
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise((F.lit(k - 1)) / F.col("kth_min_hash"))
    return agg.select(
        F.round(est, 4).alias("est_distinct"),
        F.round("kth_min_hash", 12).alias("kth_min_hash"),
        "n_sketch",
    )
