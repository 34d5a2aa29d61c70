"""CDC materialization: changelog-append and current-state (LWW) tables.

The reference's five destinations reduce to two materialization semantics
(SURVEY §2.10):

1. **Changelog append** — every change event becomes a row with
   ``cdc_operation`` + sequence metadata (ClickHouse plain MergeTree /
   Iceberg ``*_changelog``: etl-destinations/src/iceberg/core.rs:27-70).
2. **Current state** — last-write-wins per replica-identity key, versioned
   by the packed sequence, delete tombstones dropped (ClickHouse
   ReplacingMergeTree ``_etl_version``/``_etl_deleted``:
   etl-destinations/src/clickhouse/core.rs:94-110; BigQuery CDC UPSERT /
   DELETE: bigquery/core.rs:1409-1478).

The canonical Spark primitive for (2) is the ranking window

    row_number() OVER (PARTITION BY pk ORDER BY event_seq DESC) = 1
    ... AND op != 'DELETE'

which is the **max-by-key dedup** — one shuffle on the key, map-side
partial-ordering free, AQE-skew-splittable. At 100 TB the partition key is
the replica identity, so the shuffle is exactly the co-location a MERGE
would need anyway; no extra pass.

Scale notes
-----------
- The window shuffles once on ``keys``. When merging a micro-batch into a
  large existing table, prefer :func:`merge_current_state`, which prunes the
  target read to the touched keys first (broadcast semi-join when the batch
  is small) instead of re-windowing the whole table.
- Ordering under parallelism: Spark gives no cross-row apply order, so all
  merge logic orders by ``event_seq`` *inside* the plan (window ORDER BY),
  never by arrival (SURVEY §4 conclusion (b)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _key_cols(keys: list[str]) -> list[Column]:
    return [F.col(k) for k in keys]


def current_state(
    events: DataFrame,
    keys: list[str],
    seq_col: str = "event_seq",
    op_col: str = "op",
    delete_op: str = "DELETE",
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """Last-write-wins current state of a change stream.

    For each key, keep the event with the highest ``seq_col``; drop it if
    that event is a delete. Mirrors ReplacingMergeTree + ``_etl_deleted``
    semantics (clickhouse/core.rs:94-110, view SQL clickhouse/schema.rs).

    ``tie_breakers`` adds deterministic ordering after the sequence — the
    reference's internal ordinal for PK-changing updates
    (bigquery/core.rs:1391-1407).
    """
    order = [F.col(seq_col).desc()] + [F.col(t).desc() for t in (tie_breakers or [])]
    w = Window.partitionBy(*_key_cols(keys)).orderBy(*order)
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
        .drop("__rn")
    )


def changelog(
    events: DataFrame,
    seq_col: str = "event_seq",
    op_col: str = "op",
) -> DataFrame:
    """Append-only changelog rows: rename CDC metadata to the destination
    column contract (``cdc_operation``, ``cdc_sequence``) and order-stamp.

    Mirrors the Iceberg/ClickHouse changelog shape
    (iceberg/core.rs:27-70: ``cdc_operation`` + ``sequence_number``).
    Pure projection — no shuffle.
    """
    return events.withColumn("cdc_operation", F.col(op_col)).withColumn(
        "cdc_sequence", F.col(seq_col)
    )


def resolve_toast(
    events: DataFrame,
    keys: list[str],
    value_cols: list[str],
    seq_col: str = "event_seq",
    op_col: str = "op",
) -> DataFrame:
    """Resolve TOAST partial updates by filling missing column values from
    the latest prior image of the same key.

    Reference semantics (codec/event.rs:594-680): an UPDATE whose new tuple
    has ``UnchangedToast`` cells takes those cells from the old row image;
    in a totally-ordered stream the old image of key K at sequence S is the
    last value at sequence < S. Spark shape: per-key ordered window +
    ``last(value, ignorenulls=True)`` — the partial's NULL is replaced by
    the most recent non-NULL earlier in the stream.

    Requires partial columns to be NULL-marked (the envelope's
    ``missing_cols`` already identifies them; see
    :func:`null_out_missing`). One shuffle on ``keys``; the window is
    rows-unbounded-preceding so it streams within each partition.
    """
    w = (
        Window.partitionBy(*_key_cols(keys))
        .orderBy(F.col(seq_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = events
    for v in value_cols:
        out = out.withColumn(v, F.last(F.col(v), ignorenulls=True).over(w))
    return out


def null_out_missing(events: DataFrame, value_cols: list[str]) -> DataFrame:
    """Apply the envelope's ``missing_cols`` index list: NULL out the value
    columns a partial row did not carry (PartialTableRow,
    table_row.rs:68-126). Column i in ``value_cols`` corresponds to
    replicated-column index i."""
    out = events
    for i, v in enumerate(value_cols):
        out = out.withColumn(
            v,
            F.when(
                F.array_contains(F.coalesce(F.col("missing_cols"), F.array()), F.lit(i)),
                F.lit(None),
            ).otherwise(F.col(v)),
        )
    return out


def expand_pk_change(
    events: DataFrame,
    keys: list[str],
    before_prefix: str = "before_",
    seq_col: str = "event_seq",
    op_col: str = "op",
) -> DataFrame:
    """Expand PK-changing UPDATEs into DELETE(old key) + UPSERT(new key).

    Reference: bigquery/core.rs:1421-1478 — when the replica identity of the
    old image differs from the new row, the destination needs two operations,
    ordered old-delete-first via an internal ordinal tiebreaker
    (bigquery/core.rs:1391-1407). Spark shape: a conditional 1→2 row expand
    (explode over a 2-element array) with ``sub_ordinal`` 0/1 as the
    tie-breaker for downstream windows — no shuffle, runs in the scan stage.

    Expects old-image key columns as ``{before_prefix}{key}``.
    """
    key_changed = F.lit(False)
    for k in keys:
        bk = F.col(before_prefix + k)
        key_changed = key_changed | (bk.isNotNull() & (bk != F.col(k)))

    is_pk_update = (F.col(op_col) == "UPDATE") & key_changed
    variants = F.when(is_pk_update, F.array(F.lit(0), F.lit(1))).otherwise(F.array(F.lit(1)))
    out = events.withColumn("__variant", F.explode(variants))

    # variant 0 = synthetic DELETE addressed to the OLD key; variant 1 = the
    # original row (addressed to the new key).
    for k in keys:
        out = out.withColumn(
            k,
            F.when(F.col("__variant") == 0, F.col(before_prefix + k)).otherwise(F.col(k)),
        )
    out = out.withColumn(
        op_col,
        F.when(F.col("__variant") == 0, F.lit("DELETE")).otherwise(F.col(op_col)),
    )
    return out.withColumnRenamed("__variant", "sub_ordinal")


def apply_truncates(
    events: DataFrame,
    seq_col: str = "event_seq",
    op_col: str = "op",
    table_col: str = "table",
) -> DataFrame:
    """Drop every row-event at or before the latest TRUNCATE of its table.

    Reference: truncate versions/resets the destination table
    (bigquery/core.rs:56-120 SequencedBigQueryTableId; SURVEY T8). In a
    declarative plan the equivalent is a per-table high-water mark: compute
    ``max(seq) where op=TRUNCATE`` per table and filter row events to
    ``seq > truncate_seq``. Aggregation side is tiny (one row per table) —
    Catalyst broadcasts the join automatically.
    """
    truncs = (
        events.filter(F.col(op_col) == "TRUNCATE")
        .groupBy(table_col)
        .agg(F.max(seq_col).alias("__trunc_seq"))
    )
    return (
        events.join(F.broadcast(truncs), [table_col], "left")
        .filter(
            F.col("__trunc_seq").isNull()
            | (F.col(seq_col) > F.col("__trunc_seq"))
            | F.col(op_col).isin("TRUNCATE", "RELATION", "BEGIN", "COMMIT")
        )
        .drop("__trunc_seq")
    )


def merge_current_state(
    target: DataFrame,
    batch: DataFrame,
    keys: list[str],
    seq_col: str = "event_seq",
    op_col: str = "op",
    delete_op: str = "DELETE",
) -> DataFrame:
    """Merge a change micro-batch into an existing current-state table.

    Emulates ``MERGE INTO target USING batch ON keys WHEN MATCHED AND
    s.event_seq > t.event_seq`` (D1 semantics) without Delta:

    1. reduce the batch to one winner per key (:func:`current_state` on the
       batch only — cheap, batch-sized);
    2. anti-join the target on touched keys (removes superseded rows);
    3. union the surviving winners.

    At scale: the batch is micro-batch-sized, so step 2's join is a
    broadcast anti-join — the big table is scanned once, never shuffled.
    Idempotent under replay: applying the same batch twice yields the same
    table (at-least-once → exactly-once-looking, SURVEY T7).
    """
    # include target rows as pseudo-events so an older batch row never
    # clobbers a newer target row (replay safety)
    t = target.withColumn(op_col, F.lit("INSERT")) if op_col not in target.columns else target
    # allowMissingColumns = schema evolution at the merge: a column the DDL
    # just added is NULL for pre-DDL target rows; a dropped column survives
    # as NULL on new rows (destination keeps history, schema-changes.md:20-30)
    combined = t.unionByName(batch, allowMissingColumns=True)
    return current_state(combined, keys, seq_col=seq_col, op_col=op_col, delete_op=delete_op)
