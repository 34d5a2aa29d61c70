"""Incrementally-maintained rollup (continuous-aggregate analog).

The reference materializes the change stream as changelog or current-state
tables; an analytics consumer additionally wants pre-aggregated rollups
kept fresh per micro-batch (the hypertable continuous-aggregate pattern —
a custom operator Spark has no built-in for; task brief §custom operators).

Spark shape: the rollup table is parquet partitioned by the time bucket.
Each micro-batch (1) partially aggregates ITS OWN rows — map-side
combinable, tiny output; (2) reads back only the rollup partitions its
buckets touch (partition pruning — the table-sized merge never happens);
(3) re-aggregates union(existing, partial) and rewrites JUST those
partitions via dynamic partition overwrite. Work per batch is
O(batch + touched partitions), independent of rollup-table size — the
property that keeps a year-old 100 TB rollup updatable in seconds.
Storage-partition granularity is decoupled from bucket granularity
(``partition_of``, e.g. hour buckets in day dirs): the pruning a batch
needs follows its TIME SPAN, while per-dir filesystem cost (dynamic
overwrite commit, read-back listing, file count) follows dir count —
profiled round 9, 24x fewer dirs took the gate query's update cost from
~6s to ~2s per fold at sf0.1 (SCALE.md).

Only re-aggregatable functions (sum/count/min/max) participate; avg is a
sum/count pair composed at read time. Decimal sums keep the incremental
result bit-identical to a from-scratch recompute (and the SQL oracle).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _is_missing_path(exc: AnalysisException) -> bool:
    """True only for the table-does-not-exist-yet case. Any other read
    failure (IO error, corrupt footer, schema drift) must PROPAGATE —
    treating it as 'first batch' would overwrite accumulated partitions
    with just the current batch's partials (silent data loss)."""
    try:
        cls = exc.getErrorClass()
    except Exception:
        cls = None
    if cls is not None:
        return cls in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")
    return "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc)


class IncrementalRollup:
    """Maintains ``path`` as a bucket-partitioned rollup of a change stream.

    ``update(batch)`` folds one micro-batch in. The batch's distinct
    bucket list is collected driver-side — bounded by the batch's time
    span (metadata-sized by construction), it drives partition pruning on
    the read-back and is the only non-distributed step.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        bucket_col: str,
        group_cols: list[str],
        value_col: str,
        partition_of=None,
    ):
        self.spark = spark
        self.path = path
        self.bucket = bucket_col
        self.groups = group_cols
        self.value = value_col
        #: storage-partition granularity DECOUPLED from bucket granularity:
        #: ``partition_of(bucket_value) -> partition_value`` (driver-side,
        #: e.g. hour → day). Fine buckets as directories explode the
        #: filesystem (an hourly rollup = 8,760 dirs/year; each update's
        #: dynamic-overwrite commit and read-back pays per-dir), while the
        #: PRUNING a batch needs follows its time span, not its bucket
        #: count — so partition coarser than you bucket. Hive tables make
        #: the same distinction (partition by day, cluster by hour).
        #: Default: partition by the bucket itself.
        self.partition_of = partition_of
        self.partcol = f"__part_{bucket_col}" if partition_of else bucket_col

    def _with_part(self, df: DataFrame) -> DataFrame:
        if self.partition_of is None:
            return df
        return df.withColumn(self.partcol, self.partition_of(F.col(self.bucket)))

    def _schema_pin(self, df: DataFrame) -> DataFrame:
        # decimal SUM widens precision per fold (20,2 → 30,2 → …); pin the
        # stored schema so every version/partition stays byte-compatible
        return df.select(
            self.bucket,
            *self.groups,
            F.col("n").cast("long").alias("n"),
            F.col("sum_value").cast("decimal(20,2)").alias("sum_value"),
            "min_value",
            "max_value",
        )

    def _partial(self, df: DataFrame) -> DataFrame:
        return self._schema_pin(
            df.groupBy(self.bucket, *self.groups).agg(
                F.count("*").alias("n"),
                F.sum(F.col(self.value).cast("decimal(20,2)")).alias("sum_value"),
                F.min(F.col(self.value)).alias("min_value"),
                F.max(F.col(self.value)).alias("max_value"),
            )
        )

    def update(self, batch: DataFrame) -> None:
        partial = self._partial(batch).localCheckpoint(eager=True)
        keys = self._with_part(partial).select(
            self.partcol, self.bucket
        ).distinct().collect()
        if not keys:
            return
        parts = sorted({r[0] for r in keys})
        try:
            # partition pruning on the COARSE dir list — and NOTHING
            # finer: dynamic overwrite replaces each touched dir WHOLE,
            # so every row of a touched partition must ride through the
            # merge (untouched buckets pass through the re-aggregation
            # as identity). Filtering to touched buckets here would
            # silently drop their dir-mates on the rewrite.
            existing = (
                self.spark.read.parquet(self.path)
                .filter(F.col(self.partcol).isin(parts))
            )
        except AnalysisException as exc:
            if not _is_missing_path(exc):
                raise  # real failure: let the batch retry, don't clobber
            existing = None  # first batch — nothing to merge
        if existing is None:
            merged = partial
        else:
            merged = self._schema_pin(
                existing.select(*partial.columns)
                .unionByName(partial)
                .groupBy(self.bucket, *self.groups)
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("sum_value").alias("sum_value"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                )
            )
        (
            # cluster by the storage partition so each touched dir gets ONE
            # file per update (the post-merge hash layout would otherwise
            # scatter every dir across up to shuffle-partitions writers)
            self._with_part(merged)
            .repartition(F.col(self.partcol))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(self.partcol)
            .parquet(self.path)
        )

    def read(self) -> DataFrame:
        df = self.spark.read.parquet(self.path)
        return df.drop(self.partcol) if self.partition_of is not None else df
