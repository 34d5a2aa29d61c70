"""Initial snapshot scan — the reference's parallel table copy.

Reference behavior (SURVEY §2.1 S1/S2): a consistent full-table read inside
an exported-snapshot transaction, parallelized by CTID block ranges — 4
partitions per copy worker, ~250k rows per partition, capped at 1024
partitions (crates/etl/src/replication/table_sync/copy.rs:53-58, range math
crates/etl/src/postgres/client/transaction.rs:64-110), with the
publication's column list (P1) and row filter (P2) pushed into the COPY SQL
(transaction.rs:26-62, 51-55).

Spark-native equivalents:

- **files**: ``spark.read.parquet`` — file splits are the CTID ranges;
  Catalyst pushes the column list (``ReadSchema``) and row filter
  (``PushedFilters``) into the scan, so P1/P2 cost nothing.
- **JDBC**: ``partitionColumn/lowerBound/upperBound/numPartitions`` — the
  same disjoint-range union the reference builds by hand. Partition count
  follows the reference's sizing rule so each task reads ~250k rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.io import read_parquet

#: Reference sizing constants (copy.rs:53-58).
PARTITIONS_PER_WORKER = 4
TARGET_ROWS_PER_PARTITION = 250_000
MAX_PARTITIONS = 1024


def plan_partitions(estimated_rows: int, workers: int = 1) -> int:
    """Partition count per the reference's copy planner (copy.rs:132-161):
    at least ``workers * 4``, enough for ~250k rows each, at most 1024."""
    by_rows = math.ceil(max(estimated_rows, 1) / TARGET_ROWS_PER_PARTITION)
    return max(1, min(MAX_PARTITIONS, max(by_rows, workers * PARTITIONS_PER_WORKER)))


def read_snapshot(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    row_filter: str | None = None,
) -> DataFrame:
    """Read a table snapshot with publication column list + row filter.

    ``columns`` = the replication mask (P1, schema.rs:84-198) — Catalyst
    prunes the parquet scan to exactly these. ``row_filter`` = the
    publication WHERE clause (P2, transaction.rs:51-55) — pushed to the
    parquet reader as ``PushedFilters`` when the predicate allows.
    """
    df = read_parquet(spark, path)
    if columns:
        df = df.select(*columns)
    if row_filter:
        df = df.filter(F.expr(row_filter))
    return df


def read_snapshot_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower: int,
    upper: int,
    estimated_rows: int,
    workers: int = 1,
    columns: list[str] | None = None,
    row_filter: str | None = None,
    **options,
) -> DataFrame:
    """JDBC snapshot with reference-sized range partitioning (S2).

    Builds the same disjoint range scan the reference derives from CTID
    block math (transaction.rs:64-110), expressed as Spark JDBC partition
    options so each executor issues one range query.
    """
    num = plan_partitions(estimated_rows, workers)
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower))
        .option("upperBound", str(upper))
        .option("numPartitions", str(num))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load()
    if columns:
        df = df.select(*columns)
    if row_filter:
        df = df.filter(F.expr(row_filter))
    return df
