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


def _hash52(col) -> "F.Column":
    """Exact 52-bit md5 integer (first 13 hex digits): the shared
    cross-engine hash domain (< 2^53, so every derived quantity stays
    exact in BIGINT/long on both engines)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast(
        "long"
    )


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 6,
) -> DataFrame:
    """From-scratch HyperLogLog registers (Flajolet et al. '07) over the
    shared md5 hash — unlike the engines' BUILT-IN HLLs (whose register
    layouts differ, making cross-engine verification impossible), these
    registers are bit-identical on any engine that can compute md5:
    ``(groups..., reg, rho)`` with reg = h mod m and rho = leading-zero
    count of the remaining 52-p bits + 1. The per-group register table is
    the PERSISTABLE, MERGEABLE sketch (merge = max per register)."""
    group_cols = group_cols or []
    m = 1 << p
    rest_bits = 52 - p
    h = _hash52(F.col(value_col))
    reg = F.pmod(h, F.lit(m)).cast("int")
    # h / 2^p only shifts the exponent — exact in double; cast truncates
    rest = (h / F.lit(m)).cast("long")
    # bit_length(rest) = floor(log2(rest)) + 1 (exact: values sit ≥4 ulps
    # from the nearest integer boundary for rest < 2^46)
    rho = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - F.floor(F.log2(rest)).cast("int")
    )
    return (
        df.select(*group_cols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 6,
) -> DataFrame:
    """HLL estimate from a register table, in EXACT integer arithmetic
    until the final division: the harmonic sum Σ2^(−rho) is scaled by
    2^(rest_bits+1) so it is an integer (order-independent long sum — no
    float accumulation to diverge between engines). Small-range linear
    counting (m·ln(m/V)) applies below 2.5m, as in the paper.
    Returns ``(groups..., est_distinct, n_zero_registers)``."""
    group_cols = group_cols or []
    m = 1 << p
    rest_bits = 52 - p
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    scale = 1 << (rest_bits + 1)  # 2^(rest_bits+1): rho ≤ rest_bits+1 → ≥ 1
    agg = registers.groupBy(*group_cols).agg(
        # SQL shiftleft: the Python wrapper only takes a literal shift
        F.sum(F.expr(f"shiftleft(1L, {rest_bits + 1} - rho)")).alias("s_present"),
        F.count("*").alias("n_present"),
    )
    zeros = F.lit(m) - F.col("n_present")
    s_total = F.col("s_present") + zeros * F.lit(scale)
    raw = F.lit(alpha * m * m * float(scale)) / s_total.cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.round(est, 4).alias("est_distinct"),
        zeros.cast("long").alias("n_zero_registers"),
    )


def count_min(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 128,
) -> DataFrame:
    """Count-Min sketch table (Cormode & Muthukrishnan '05): ``(row,
    cell, c)`` counts with ``depth`` salted md5 hash rows × ``width``
    cells — integer-exact and engine-independent. Point estimate for a
    key = min over rows of its cell count (see
    :func:`count_min_estimate`); the table itself is the mergeable,
    persistable sketch (merge = cell-wise sum)."""
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(
                    _hash52(F.concat(F.lit(f"s{i}:"), F.col(value_col).cast("string"))),
                    F.lit(width),
                ).cast("int").alias("cell"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rc"))
        .select("rc.row", "rc.cell")
        .groupBy("row", "cell")
        .agg(F.count("*").alias("c"))
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 128,
) -> DataFrame:
    """Point-frequency estimates for ``probes[value_col]`` against a
    count-min table: est = min over the key's ``depth`` cells (upper
    bound on the true count, exact-integer on every engine). The probe
    side explodes to (key, row, cell) and LEFT-joins the sketch — the
    sketch table only materializes non-empty cells, so a probe cell with
    no match is a zero counter (a true count-min mins over ALL depth
    cells including zeros): a key absent from the stream estimates 0
    even when some of its cells collide with present keys. The sketch is
    depth·width rows, so the join broadcasts."""
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(
                    _hash52(F.concat(F.lit(f"s{i}:"), F.col(value_col).cast("string"))),
                    F.lit(width),
                ).cast("int").alias("cell"),
            )
            for i in range(depth)
        ]
    )
    probe_cells = probes.select(
        F.col(value_col), F.explode(rows).alias("rc")
    ).select(value_col, "rc.row", "rc.cell")
    return (
        probe_cells.join(F.broadcast(sketch), ["row", "cell"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0).cast("long"))).alias("cm_est"))
    )


def misra_gries_candidates(df: DataFrame, key: str, k: int = 128) -> DataFrame:
    """Per-partition Misra–Gries heavy-hitter summaries (Misra & Gries
    '82), batch-merged with the mergeable-summary decrement rule
    (Agarwal et al., "Mergeable Summaries", PODS '12): each Arrow batch's
    exact value_counts folds into at most ``k`` weighted counters; when
    more than ``k`` keys remain, the (k+1)-st largest weight is
    subtracted from ALL counters and non-positive keys drop (at most k
    survive, each undercounted by at most the evicted mass).

    Guarantee used by callers: a partition's summary error is ≤
    n_p/(k+1), so any key with GLOBAL frequency > Σ n_p/(k+1) = n/(k+1)
    retains a positive counter in at least one partition — the union of
    survivors is a superset of every such key, and an exact re-count of
    that candidate set is a PROVABLY complete heavy-hitter answer
    (events_heavy_hitters_mg).

    Scale shape: state is a ≤k-entry dict per partition; output is ≤ k
    rows per partition (``lower_bound`` = the residual counter, a lower
    bound on partition frequency). The input column must be integral
    (reference sketch-family discipline: sketch_count_min_users).
    """

    def mg(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for key_val, c in pdf[df_key].value_counts().items():
                counters[key_val] = counters.get(key_val, 0) + int(c)
            if len(counters) > k:
                kth = sorted(counters.values(), reverse=True)[k]
                counters = {
                    kv: c - kth for kv, c in counters.items() if c > kth
                }
        yield pd.DataFrame(
            {df_key: list(counters), "lower_bound": list(counters.values())},
            columns=[df_key, "lower_bound"],
        ).astype({df_key: "int64", "lower_bound": "int64"})

    df_key = key
    return df.select(key).mapInPandas(mg, f"{key} long, lower_bound long")
