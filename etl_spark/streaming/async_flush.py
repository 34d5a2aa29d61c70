"""Async pipelined flush (SURVEY T5, reference apply.rs:1956-2023).

The reference overlaps destination writes with the next batch's
accumulation: one ``pending_flush_result`` may be in flight; dispatching
the next batch first settles it, and durable progress (flush LSN) only
advances when the destination acknowledges.

Spark shape: :class:`AsyncFlushSink` wraps any :class:`Sink` with a
single-thread executor. ``write_changes``/``truncate`` dispatch and
return immediately; the NEXT batch's :meth:`await_pending` (called by the
pipeline before it dispatches new writes) blocks until the in-flight
batch resolves and re-raises its failure — so at most one batch is
unacknowledged, failures surface before any later dispatch, and the
stream's next micro-batch READ overlaps the previous batch's WRITE.
A flush failure fails the apply loop (stream error → restart replays from
the checkpoint; idempotent sinks converge) — same semantics as the
reference, where per-table quarantine covers apply-time errors and flush
errors abort the loop.

``write_snapshot`` stays synchronous: the copy path is bulk-throughput
bound, not latency-pipelined (the reference pipelines only streamed event
batches).
"""

from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor

from pyspark.sql import DataFrame

from etl_spark.streaming.sinks import Sink


class AsyncFlushSink(Sink):
    """One-in-flight pipelined writes over an inner sink."""

    def __init__(self, inner: Sink):
        self.inner = inner
        self._pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="etl-flush")
        self._pending: list[Future] = []

    # -- pipelining ---------------------------------------------------------
    def await_pending(self) -> None:
        """Settle the in-flight batch (the pending_flush_result): block
        until every dispatched job resolves, re-raising the first failure."""
        pending, self._pending = self._pending, []
        first_err: Exception | None = None
        for f in pending:
            try:
                f.result()
            except Exception as exc:  # noqa: BLE001 - re-raised below
                if first_err is None:
                    first_err = exc
        if first_err is not None:
            raise first_err

    def after_flush(self, callback) -> None:
        """Run ``callback`` after every job dispatched so far completes —
        the durability hook (flush-LSN advance, unpersist). Executes on the
        flush thread, in dispatch order."""
        self._pending.append(self._pool.submit(callback))

    # -- Sink ---------------------------------------------------------------
    def write_snapshot(self, table: str, df: DataFrame) -> None:
        self.inner.write_snapshot(table, df)

    def write_changes(self, table: str, df: DataFrame, batch_id: int) -> None:
        self._pending.append(
            self._pool.submit(self.inner.write_changes, table, df, batch_id)
        )

    def truncate(self, table: str) -> None:
        # ordered with respect to in-flight writes (truncate-then-write
        # sequencing inside a batch must survive the async boundary)
        self._pending.append(self._pool.submit(self.inner.truncate, table))

    def startup(self) -> None:
        self.inner.startup()

    def shutdown(self) -> None:
        """Drain, then shut down (the reference's Complete exit intent:
        the final batch must confirm cumulative durability)."""
        try:
            self.await_pending()
        finally:
            self._pool.shutdown(wait=True)
            self.inner.shutdown()

    def read(self, *args, **kwargs):
        """Read-through AFTER settling pending writes (read-your-writes
        for tests/consumers)."""
        self.await_pending()
        return self.inner.read(*args, **kwargs)
