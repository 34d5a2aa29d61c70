"""Change-stream readers: batch + Structured Streaming envelope sources.

The reference's WAL streaming source (SURVEY §2.1 S3: pgoutput frames →
typed events, crates/etl/src/postgres/stream/replication_message.rs) maps
to a Structured Streaming source over an append-only change log. This
module provides:

- :func:`read_changes` / :func:`stream_changes` — batch and streaming
  readers over envelope parquet/JSON directories (checkpoint directory =
  replication slot, SURVEY S4);
- :func:`envelope_from_events` — the deterministic sim-harness derivation
  of a CDC envelope from the driver's ``events`` table, used by tests,
  bench, and the correctness gate (its DuckDB-SQL mirror lives in
  ``__spark_entry__.oracle_sql``).

Per-table routing (P3 ``should_apply_changes``, apply.rs:2626-2639) and
event-type filtering (P4, apply.rs:2113-2125) are plain ``filter`` calls —
Catalyst pushes both into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.envelope import GENERIC_ENVELOPE, ROW_OPS, with_sequence
from etl_spark.io import read_table


def ts_from_nanos(col):
    """TIMESTAMP(NANOS) parquet columns arrive as long (nanosAsLong);
    convert to TimestampNTZ at micro precision."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros((c / 1000).cast("long")).cast("timestamp_ntz")


def read_changes(
    spark: SparkSession, path: str, table: str | None = None, fmt: str = "parquet"
) -> DataFrame:
    """Batch-read an envelope directory; optionally route one table (P3).

    ``fmt``: parquet (sim harness), json (JSON-lines, what WAL shippers
    like Debezium emit), or csv — all land on the same GENERIC_ENVELOPE
    schema, so everything downstream is format-agnostic."""
    df = _read(spark.read, path, fmt)
    df = with_sequence(df)
    if table:
        df = df.filter(F.col("table") == table)
    return df


def _read(reader, path: str, fmt: str) -> DataFrame:
    if fmt == "parquet":
        return reader.schema(GENERIC_ENVELOPE).parquet(path)
    if fmt == "json":
        return reader.schema(GENERIC_ENVELOPE).json(path)
    if fmt == "csv":
        # CSV has no array type: `missing_cols` travels as a JSON string
        # (e.g. "[1,2]") and is parsed back, so downstream still sees the
        # exact GENERIC_ENVELOPE shape
        from pyspark.sql import types as T

        csv_schema = T.StructType(
            [
                T.StructField(f.name, T.StringType(), True)
                if f.name == "missing_cols"
                else f
                for f in GENERIC_ENVELOPE.fields
            ]
        )
        # RFC-4180 quoting (embedded quotes doubled) — Spark's default
        # escape is backslash, which silently corrupts JSON row images
        df = (
            reader.schema(csv_schema)
            .option("header", "true")
            .option("escape", '"')
            .csv(path)
        )
        return df.withColumn(
            "missing_cols", F.from_json("missing_cols", "array<int>")
        )
    raise ValueError(f"unsupported envelope format: {fmt}")


def stream_changes(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    max_files_per_trigger: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Streaming envelope source. The checkpoint dir (set on the writer)
    plays the replication slot's role: offsets = progress, deleting it =
    slot invalidation → full re-sync (SURVEY S4).

    ``max_files_per_trigger`` is the batch-size budget (T1: the
    reference's EventBatch byte/deadline flush, apply.rs:645-695, mapped
    onto Spark's per-trigger source limit — one WAL-shipper flush file ≈
    one budgeted batch)."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = _read(reader, path, fmt)
    df = with_sequence(df)
    if table:
        df = df.filter(F.col("table") == table)
    return df


def filter_supported(df: DataFrame) -> DataFrame:
    """Drop unsupported event kinds (P4: Origin/Type/unknown logical
    messages are dropped with warnings, apply.rs:2113-2125)."""
    return df.filter(F.col("op").isin(*ROW_OPS, "TRUNCATE", "RELATION", "BEGIN", "COMMIT"))


# ---------------------------------------------------------------------------
# Sim harness: deterministic envelope from the driver's `events` table
# ---------------------------------------------------------------------------

#: event_type → CDC op for the sim derivation. signup creates the user row,
#: error deletes it, activity events update it.
OP_MAPPING_SQL = (
    "CASE event_type WHEN 'signup' THEN 'INSERT' WHEN 'error' THEN 'DELETE' "
    "ELSE 'UPDATE' END"
)

#: Events per simulated transaction.
TX_SIZE = 10


def envelope_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic CDC envelope from ``events.parquet``.

    Shape: each block of :data:`TX_SIZE` consecutive ``event_id``s is one
    transaction (``commit_lsn`` = block index, ``tx_ordinal`` = offset);
    the replica identity is ``user_id``; payload columns are ``value`` and
    ``props``. ``event_seq`` then restores exactly the source's
    ``event_id`` order, so every downstream materialization is
    deterministic and oracle-checkable.
    """
    ev = read_table(spark, sf_dir, "events")
    env = ev.select(
        F.expr(OP_MAPPING_SQL).alias("op"),
        F.lit("public.users").alias("table"),
        (F.col("event_id").cast("long") / TX_SIZE).cast("long").alias("commit_lsn"),
        F.col("event_id").cast("long").alias("start_lsn"),
        (F.col("event_id") % TX_SIZE).cast("long").alias("tx_ordinal"),
        F.col("user_id").alias("pk"),
        F.col("value"),
        F.col("props"),
        F.col("ts"),
    )
    return with_sequence(env)


#: Identity-change offset for the sim: a ``purchase`` moves the row to a new
#: identity ``user_id + IDENTITY_SHIFT`` (disjoint from real user ids).
IDENTITY_SHIFT = 1_000_000


def envelope_with_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sim envelope exercising REPLICA IDENTITY DEFAULT old-row shapes.

    Mirrors the reference's identity matrix
    (crates/etl/tests/pipeline_replica_identity.rs, old-row model
    table_row.rs:193-198): the old image travels as a JSON ``before``
    string whose kind depends on the operation —

    - ``signup`` → INSERT: full ``after``, no old row (``before_kind`` NONE);
    - ``click``/``view`` → non-identity UPDATE: full ``after``, NO old row
      (pgoutput sends no old tuple when the identity is unchanged);
    - ``purchase`` → identity-CHANGING update: ``after`` addressed at
      ``user_id + IDENTITY_SHIFT``, ``before`` is the KEY-ONLY old row
      ``{"user_id": old}``;
    - ``error`` → DELETE: no new image, ``before`` is the key-only old row.

    ``value``/``props`` stay typed (doubles through JSON would break
    cross-engine text parity); only the identity routes through JSON.
    """
    ev = read_table(spark, sf_dir, "events")
    op = F.expr(OP_MAPPING_SQL)
    is_ident_change = F.col("event_type") == "purchase"
    new_key = F.when(
        is_ident_change, F.col("user_id") + IDENTITY_SHIFT
    ).otherwise(F.col("user_id"))
    after = F.when(
        op != "DELETE", F.format_string('{"user_id": %d}', new_key)
    )
    before = F.when(
        (op == "DELETE") | is_ident_change,
        F.format_string('{"user_id": %d}', F.col("user_id")),
    )
    env = ev.select(
        op.alias("op"),
        F.lit("public.users").alias("table"),
        (F.col("event_id").cast("long") / TX_SIZE).cast("long").alias("commit_lsn"),
        F.col("event_id").cast("long").alias("start_lsn"),
        (F.col("event_id") % TX_SIZE).cast("long").alias("tx_ordinal"),
        after.alias("after"),
        before.alias("before"),
        F.when(before.isNotNull(), F.lit("KEY")).otherwise(F.lit("NONE")).alias("before_kind"),
        F.col("value"),
        F.col("props"),
    )
    return with_sequence(env)
