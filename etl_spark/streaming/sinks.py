"""Pluggable sinks — the reference's ``Destination`` trait re-expressed.

Contract (crates/etl/src/destination/base.rs:27-213):
``write_snapshot`` ≈ ``write_table_rows`` (initial copy batches),
``write_changes`` ≈ ``write_events`` (streamed change batches),
``truncate`` ≈ ``drop_table_for_copy``. foreachBatch is synchronous, so
every write is the reference's ``Durable`` result — the ``Accepted``
(deferred durability) mode is a sink-internal optimization we intentionally
drop (SURVEY T5: "simplest correct port is synchronous Durable-only").

Two parquet materializations mirror the two destination semantics
(SURVEY §2.10): changelog-append and current-state. Current state uses a
versioned-directory swap (write new version, atomically repoint a VERSION
file) because plain parquet has no MERGE; on Delta/Iceberg the same class
shape becomes a real ``MERGE INTO``.
"""

from __future__ import annotations

import json
import os
import tempfile
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.operators import materialize


class Sink(ABC):
    """Destination plug-in surface (destination/base.rs:27-213)."""

    @abstractmethod
    def write_snapshot(self, table: str, df: DataFrame) -> None:
        """Initial-copy rows for ``table`` (write_table_rows)."""

    @abstractmethod
    def write_changes(self, table: str, df: DataFrame, batch_id: int) -> None:
        """One micro-batch of change events (write_events). MUST be
        idempotent under batch replay (at-least-once source)."""

    def truncate(self, table: str) -> None:  # pragma: no cover - default noop
        """Reset destination state for re-copy (drop_table_for_copy)."""

    def startup(self) -> None:  # pragma: no cover - default noop
        pass

    def shutdown(self) -> None:  # pragma: no cover - default noop
        pass


class ParquetChangelogSink(Sink):
    """Append-only changelog: every event row with ``cdc_operation`` +
    ``cdc_sequence`` (iceberg/core.rs:27-70 table shape). Replay-safe via
    batch-id dedup directories (one output dir per batch id — rewriting the
    same batch overwrites, not duplicates: the DuckLake ``applied_batches``
    idea, ducklake/core.rs:74-80, as idempotent file layout)."""

    def __init__(self, root: str):
        self.root = root

    def write_snapshot(self, table: str, df: DataFrame) -> None:
        out = os.path.join(self.root, table, "snapshot")
        df.write.mode("overwrite").parquet(out)

    def write_changes(self, table: str, df: DataFrame, batch_id: int) -> None:
        out = os.path.join(self.root, table, f"batch={batch_id}")
        materialize.changelog(df).write.mode("overwrite").parquet(out)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.option("recursiveFileLookup", "true").parquet(
            os.path.join(self.root, table)
        )


class ParquetCurrentStateSink(Sink):
    """Current-state (LWW) table with versioned-directory swap.

    Each ``write_changes`` merges the batch into the live version via
    :func:`etl_spark.operators.materialize.merge_current_state` and writes
    version N+1, then atomically repoints ``VERSION``. Readers resolve
    ``VERSION`` first → snapshot isolation without a table format; replays
    of the same batch converge to the same content (LWW by event_seq).
    """

    def __init__(self, root: str, keys: list[str], spark: SparkSession):
        self.root = root
        self.keys = keys
        self.spark = spark

    # -- version plumbing --------------------------------------------------
    def _vpath(self, table: str) -> str:
        return os.path.join(self.root, table, "VERSION")

    def _current_meta(self, table: str) -> dict:
        try:
            with open(self._vpath(table)) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"version": -1, "batch_id": None}

    def _current_version(self, table: str) -> int:
        return self._current_meta(table)["version"]

    def _point(self, table: str, version: int, batch_id: int | None) -> None:
        os.makedirs(os.path.dirname(self._vpath(table)), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self._vpath(table)))
        with os.fdopen(fd, "w") as f:
            json.dump({"version": version, "batch_id": batch_id}, f)
        os.replace(tmp, self._vpath(table))

    def _data_dir(self, table: str, version: int) -> str:
        return os.path.join(self.root, table, f"v{version}")

    # -- Sink --------------------------------------------------------------
    def write_snapshot(self, table: str, df: DataFrame, snapshot_lsn: int = 0) -> None:
        from pyspark.sql import functions as F

        # stamp snapshot rows as INSERTs at the snapshot LSN so stream
        # batches merge against them by event_seq (overlap-safe, SURVEY T6)
        for col, expr in {
            "op": F.lit("INSERT"),
            "commit_lsn": F.lit(snapshot_lsn).cast("long"),
            "tx_ordinal": F.lit(0).cast("long"),
            "event_seq": F.lit(snapshot_lsn).cast("decimal(38,0)")
            * F.lit("18446744073709551616").cast("decimal(38,0)"),
        }.items():
            if col not in df.columns:
                df = df.withColumn(col, expr)
        v = self._current_version(table) + 1
        df.write.mode("overwrite").parquet(self._data_dir(table, v))
        self._point(table, v, None)

    def write_changes(self, table: str, df: DataFrame, batch_id: int) -> None:
        meta = self._current_meta(table)
        v = meta["version"]
        if v < 0:
            raise RuntimeError(f"no snapshot for {table}; run write_snapshot first")
        if meta.get("batch_id") == batch_id:
            # replayed delivery of the already-applied batch (restart between
            # sink write and checkpoint commit): the LWW merge would converge
            # anyway — this is the applied-batches fast path
            # (ducklake/core.rs:74-80)
            return
        target = self.spark.read.parquet(self._data_dir(table, v))
        merged = materialize.merge_current_state(target, df, self.keys)
        nv = v + 1
        merged.write.mode("overwrite").parquet(self._data_dir(table, nv))
        self._point(table, nv, batch_id)

    def truncate(self, table: str) -> None:
        v = self._current_version(table)
        if v < 0:
            return  # nothing to drop (fresh table pre-copy)
        cur = self.spark.read.parquet(self._data_dir(table, v))
        cur.limit(0).write.mode("overwrite").parquet(self._data_dir(table, v + 1))
        self._point(table, v + 1, None)

    def read(self, table: str) -> DataFrame:
        v = self._current_version(table)
        if v < 0:
            raise RuntimeError(f"no data for {table}")
        return self.spark.read.parquet(self._data_dir(table, v))


class MemorySink(Sink):
    """Test sink: accumulates rows driver-side (NotifyingStore-style test
    double, test_utils/test_destination_wrapper.rs)."""

    def __init__(self):
        self.snapshots: dict[str, list] = {}
        self.batches: list[tuple[str, int, list]] = []
        self.truncated: list[str] = []

    def write_snapshot(self, table: str, df: DataFrame) -> None:
        self.snapshots[table] = df.collect()

    def write_changes(self, table: str, df: DataFrame, batch_id: int) -> None:
        self.batches.append((table, batch_id, df.collect()))

    def truncate(self, table: str) -> None:
        self.truncated.append(table)


class ParquetScd2Sink(Sink):
    """Versioned-dimension (SCD type-2) destination: one row per key
    VERSION with ``valid_from`` / ``valid_to`` / ``is_current``,
    maintained INCREMENTALLY per micro-batch — the warehouse shape
    :func:`etl_spark.workload.cdc_scd2_history` computes as a batch
    query, kept continuously up to date by the stream (beyond-reference
    destination semantics: the reference emits the changelog; versioned
    assembly is left to the warehouse).

    Semantics (identical to the batch query): every INSERT/UPDATE opens a
    version at its commit LSN; the key's next event — update OR delete —
    closes it; DELETE rows emit no version but persist internally as
    TOMBSTONES so later batches and replays keep closure correct.

    Incremental merge per batch: split the stored table into untouched
    keys (left anti on the batch's key set — scanned, never recomputed)
    and touched keys, union the touched keys' stored EVENT history with
    the batch, drop duplicate (key, event_seq) rows — the replay/
    idempotence guard — and recompute validity bounds with the same
    per-key lead window over the total event order. Work per batch is
    O(batch + touched-key history); at warehouse scale with the table
    bucketed by key the anti/semi joins are bucket-local.

    Same versioned-directory swap + applied-batch fast path as
    :class:`ParquetCurrentStateSink`.
    """

    def __init__(self, root: str, keys: list[str], spark: SparkSession):
        self.root = root
        self.keys = keys
        self.spark = spark

    _vpath = ParquetCurrentStateSink._vpath
    _current_meta = ParquetCurrentStateSink._current_meta
    _current_version = ParquetCurrentStateSink._current_version
    _point = ParquetCurrentStateSink._point
    _data_dir = ParquetCurrentStateSink._data_dir

    def _derive(self, events: DataFrame) -> DataFrame:
        """Validity bounds from raw events (the cdc_scd2_history window)."""
        from pyspark.sql import Window

        w = Window.partitionBy(*self.keys).orderBy("event_seq")
        return (
            events.withColumn("valid_to", F.lead("commit_lsn").over(w))
            .withColumn(
                "is_current",
                F.col("valid_to").isNull() & (F.col("op") != "DELETE"),
            )
        )

    def write_snapshot(self, table: str, df: DataFrame, snapshot_lsn: int = 0) -> None:
        for col, expr in {
            "op": F.lit("INSERT"),
            "commit_lsn": F.lit(snapshot_lsn).cast("long"),
            "tx_ordinal": F.lit(0).cast("long"),
            "event_seq": F.lit(snapshot_lsn).cast("decimal(38,0)")
            * F.lit("18446744073709551616").cast("decimal(38,0)"),
        }.items():
            if col not in df.columns:
                df = df.withColumn(col, expr)
        v = self._current_version(table) + 1
        self._derive(df).write.mode("overwrite").parquet(self._data_dir(table, v))
        self._point(table, v, None)

    def write_changes(self, table: str, df: DataFrame, batch_id: int) -> None:
        meta = self._current_meta(table)
        v = meta["version"]
        if v < 0:
            raise RuntimeError(f"no snapshot for {table}; run write_snapshot first")
        if meta.get("batch_id") == batch_id:
            return  # applied-batches fast path (replayed delivery)
        target = self.spark.read.parquet(self._data_dir(table, v))
        touched = df.select(*self.keys).distinct()
        untouched = target.join(touched, self.keys, "left_anti")
        event_cols = [c for c in target.columns if c not in ("valid_to", "is_current")]
        touched_hist = target.join(touched, self.keys, "left_semi").select(*event_cols)
        batch_events = df.select(
            *[c if c in df.columns else F.lit(None).alias(c) for c in event_cols]
        )
        merged_events = touched_hist.unionByName(batch_events).dropDuplicates(
            [*self.keys, "event_seq"]
        )
        out = untouched.unionByName(self._derive(merged_events))
        nv = v + 1
        out.write.mode("overwrite").parquet(self._data_dir(table, nv))
        self._point(table, nv, batch_id)

    def truncate(self, table: str) -> None:
        v = self._current_version(table)
        if v < 0:
            return
        cur = self.spark.read.parquet(self._data_dir(table, v))
        cur.limit(0).write.mode("overwrite").parquet(self._data_dir(table, v + 1))
        self._point(table, v + 1, None)

    def read(self, table: str) -> DataFrame:
        """The SCD2 surface: version rows only (tombstones are internal
        closure bookkeeping, not versions)."""
        v = self._current_version(table)
        if v < 0:
            raise RuntimeError(f"no data for {table}")
        return (
            self.spark.read.parquet(self._data_dir(table, v))
            .filter(F.col("op") != "DELETE")
            .withColumnRenamed("commit_lsn", "valid_from")
        )
