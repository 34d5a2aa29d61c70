"""Replicator service orchestration: a validated
:class:`~etl_spark.config.PipelineConfig` drives source construction,
initial table sync, and the resilient live loop — the
`etl-replicator` crate's entrypoint re-expressed for this engine
(`crates/etl-replicator/src/core.rs`: load config → init store →
build destination → start pipeline; the pipeline/table-sync knobs it
threads live in `crates/etl-config/src/shared/pipeline.rs`).

What the config drives, and where it lands:

- ``pg_connection`` → :class:`SocketReplicationSource` kwargs via the
  ssl-mode ladder (``PgConnectionConfig.to_source_kwargs``), with
  ``publication_name`` threaded into START_REPLICATION.
- ``table_sync_copy.should_copy_table(oid)`` → which tables get an
  initial copy at all (IncludeAll/SkipAll/Include/Skip semantics,
  pipeline.rs:171-179). A skipped table is streamed-only.
- ``max_copy_connections_per_table`` → serial
  :func:`snapshot_via_copy` vs the multi-connection
  :func:`snapshot_via_copy_parallel` pool (pipeline.rs:285-291:
  "initial copy always uses ctid range work items, including when this
  is set to 1"; more planned ranges than connections is expected).
- ``batch.max_bytes`` → the COPY relay batch ceiling (the per-stream
  byte budget analog).
- ``invalidated_slot_behavior`` + ``table_error_retry_*`` → the
  resilient live loop's slot policy, retry budget, and backoff base
  (the reference's worker restart loop, worker.rs:280-320).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from etl_spark.config import PipelineConfig


@dataclass
class TableSpec:
    """One publication member the replicator syncs/streams.

    ``oid`` is the Postgres table id the copy rules key on
    (pipeline.rs:159-166 use table ids, not names); ``ctid_ranges``
    are the planned copy work items ((start, end) ctid strings, open
    ends None) — S2's layout planner or the server's size estimate
    produces them.
    """

    oid: int
    name: str
    payload_schema: str
    column_list: list[str] | None = None
    row_filter: str | None = None
    ctid_ranges: list[tuple[str | None, str | None]] = field(
        default_factory=list
    )


class Replicator:
    """Config-driven orchestration over the socket transport.

    ``make_source`` defaults to building a
    :class:`SocketReplicationSource` from the config's connection
    block; tests inject a loopback-pointing factory the same way the
    reference injects its test connection pool.
    """

    def __init__(self, spark: SparkSession, config: PipelineConfig,
                 work_dir: str, make_source=None):
        config.validate()
        self.spark = spark
        self.config = config
        self.work_dir = work_dir
        self._make_source = make_source or self._default_source

    def _default_source(self):
        from etl_spark.sources.socket_transport import SocketReplicationSource

        return SocketReplicationSource(
            **self.config.pg_connection.to_source_kwargs(
                publication=self.config.publication_name
            )
        )

    def slot_name(self) -> str:
        """Pipeline-id-scoped slot name — the id is the isolation unit
        (pipeline.rs:249-253)."""
        return f"etl_pipeline_{self.config.id}"

    def initial_sync(self, tables: list[TableSpec],
                     snapshot_name: str | None = None
                     ) -> dict[str, DataFrame]:
        """Runs the configured initial copy for every eligible table.

        Returns ``{table_name: DataFrame}`` for the tables that were
        copied; tables the ``table_sync_copy`` rules exclude are absent
        (they stream from the slot's consistent point instead). Each
        table's parquet lands under ``<work_dir>/sync/<table>``.
        """
        from etl_spark.sources.snapshot import (
            snapshot_via_copy,
            snapshot_via_copy_parallel,
        )

        out: dict[str, DataFrame] = {}
        pool = self.config.max_copy_connections_per_table
        for t in tables:
            if not self.config.table_sync_copy.should_copy_table(t.oid):
                continue
            dest = os.path.join(
                self.work_dir, "sync", t.name.replace(".", "_")
            )
            if pool > 1 and len(t.ctid_ranges) > 1:
                out[t.name] = snapshot_via_copy_parallel(
                    self.spark, self._make_source, t.name,
                    t.payload_schema, dest,
                    ctid_ranges=t.ctid_ranges,
                    column_list=t.column_list,
                    row_filter=t.row_filter,
                    snapshot_name=snapshot_name,
                    max_connections=pool,
                    batch_bytes=self.config.batch.max_bytes,
                )
            else:
                src = self._make_source()
                try:
                    out[t.name] = snapshot_via_copy(
                        self.spark, src, t.name, t.payload_schema, dest,
                        column_list=t.column_list,
                        row_filter=t.row_filter,
                        snapshot_name=snapshot_name,
                        ctid_ranges=t.ctid_ranges or None,
                        batch_bytes=self.config.batch.max_bytes,
                    )
                finally:
                    src.close()
        return out

    def run(self, pump, pipeline, stop,
            wal_sender_timeout_s: float = 60.0) -> None:
        """Enters the resilient live loop with the configured slot
        policy and retry budget: ``table_error_retry_max_attempts``
        bounds CONSECUTIVE transport failures,
        ``table_error_retry_delay_ms`` seeds the exponential backoff,
        and ``invalidated_slot_behavior`` decides error-vs-recreate on
        a lost slot (the same strings live.resolve_start_lsn accepts,
        pinned by tests)."""
        pump.run_live_resilient(
            pipeline, stop, self.slot_name(),
            wal_sender_timeout_s=wal_sender_timeout_s,
            max_retries=self.config.table_error_retry_max_attempts,
            backoff_s=self.config.table_error_retry_delay_ms / 1000.0,
            invalidated_slot_behavior=self.config.invalidated_slot_behavior,
        )
