"""As-of (point-in-time) joins — the schema-version lookup generalized.

The reference resolves "largest snapshot_id ≤ requested LSN"
(crates/etl/src/store/schema/base.rs:20-34) — a classic backward as-of
join. Spark has no native as-of join; this module provides two strategies:

- :func:`asof_join` — the **union trick**: tag both sides, union, one
  ordered window per partition key, ``last(..., ignorenulls)`` carries the
  most recent right-side row forward onto each left row. ONE shuffle total,
  scales to any size on both sides, skew-safe under AQE. This is the
  100 TB path.
- :func:`asof_join_broadcast` — when the right side is small (a schema
  registry has thousands of rows, not billions): non-equi broadcast join +
  max-by. Zero shuffle of the left side.

Both return the left rows with the matched right-side columns appended.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Backward/forward as-of join via union + ordered window.

    For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (backward) or least ``right_ts >= left_ts``
    (forward) within the same ``on`` partition.

    Cost model: both inputs shuffle once on ``on``; within a partition the
    window is a single sort + linear scan. No cross-product, no range
    explosion — the strategy of choice when both sides are large.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    value_cols = value_cols or [c for c in right.columns if c not in on and c != right_ts]

    # keep the native ordering type (DECIMAL(38,0) sequence keys must not
    # round-trip through double — precision loss above 2^53)
    ts_type = dict(left.dtypes)[left_ts]
    l_tag = left.withColumn("__ts", F.col(left_ts).cast(ts_type)).withColumn(
        "__is_left", F.lit(1)
    )
    for v in value_cols:
        l_tag = l_tag.withColumn(f"__r_{v}", F.lit(None).cast(dict(right.dtypes)[v]))
    r_tag = right.select(
        *on,
        F.col(right_ts).cast(ts_type).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(v).alias(f"__r_{v}") for v in value_cols],
    )
    left_cols = [c for c in l_tag.columns if not c.startswith("__")]
    unioned = l_tag.select(
        *left_cols, "__ts", "__is_left", *[f"__r_{v}" for v in value_cols]
    ).unionByName(
        r_tag.select(
            *[F.lit(None).cast(dict(l_tag.dtypes)[c]).alias(c) for c in left_cols if c not in on]
            + [F.col(c) for c in on]
            + [F.col("__ts"), F.col("__is_left")]
            + [F.col(f"__r_{v}") for v in value_cols],
        ),
        allowMissingColumns=False,
    )

    # Right rows sort before left rows at equal ts (backward: a version
    # effective AT t applies to an event at t) — order by (__ts, __is_left).
    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = unioned.select(
            "*", *[F.last(f"__r_{v}", ignorenulls=True).over(w).alias(f"__f_{v}") for v in value_cols]
        )
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = unioned.select(
            "*", *[F.last(f"__r_{v}", ignorenulls=True).over(w).alias(f"__f_{v}") for v in value_cols]
        )

    out = filled.filter(F.col("__is_left") == 1).select(
        *left_cols, *[F.col(f"__f_{v}").alias(v) for v in value_cols]
    )
    return out


def asof_lookup_literal(
    left: DataFrame,
    versions: list[tuple[int, str]],
    left_ts: str,
    out_ts: str = "snapshot_lsn",
    out_val: str = "schema_version",
) -> DataFrame:
    """As-of lookup against a tiny driver-side version list — zero shuffle.

    The schema registry is small by construction (one row per DDL event per
    table — store/schema/base.rs:20-34, pruned by GC apply.rs:1607-1757), so
    the cheapest distributed plan is no plan at all: compile the sorted
    version list into a CASE chain evaluated inside the scan stage. Whole-
    stage codegen, no join, no shuffle — survives any left-side scale.

    Use :func:`asof_join_broadcast` when the registry has grown past a few
    thousand entries, and :func:`asof_join` when it is genuinely large.
    """
    ordered = sorted(versions, key=lambda kv: kv[0], reverse=True)
    ts_expr = F.col(left_ts)
    val_expr = F.lit(None).cast("string")
    lsn_expr = F.lit(None).cast("long")
    for lsn, val in reversed(ordered):
        # build bottom-up so the highest matching lsn wins
        cond = ts_expr >= F.lit(lsn)
        val_expr = F.when(cond, F.lit(val)).otherwise(val_expr)
        lsn_expr = F.when(cond, F.lit(lsn)).otherwise(lsn_expr)
    return left.withColumn(out_ts, lsn_expr).withColumn(out_val, val_expr)


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join with a broadcast-small right side.

    Non-equi join ``right_ts <= left_ts`` then max-by per left row. The
    right side is broadcast so the (potentially 100 TB) left side is never
    shuffled — exactly how the schema-registry as-of lookup
    (store/schema/base.rs:20-34) should run: the registry is tiny.
    """
    value_cols = value_cols or [c for c in right.columns if c not in on and c != right_ts]
    r = right.select(
        *[F.col(k).alias(f"__k_{k}") for k in on],
        F.col(right_ts).alias("__rts"),
        *[F.col(v).alias(f"__r_{v}") for v in value_cols],
    )
    lid = left.withColumn("__lid", F.monotonically_increasing_id())
    cond = F.lit(True)
    for k in on:
        cond = cond & (F.col(k) == F.col(f"__k_{k}"))
    cond = cond & (F.col("__rts") <= F.col(left_ts))
    joined = lid.join(F.broadcast(r), cond, "left")
    w = Window.partitionBy("__lid").orderBy(F.col("__rts").desc_nulls_last())
    best = joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return best.select(
        *left.columns, *[F.col(f"__r_{v}").alias(v) for v in value_cols]
    )
