"""Async pipelined flush (SURVEY T5, reference apply.rs:1956-2023).

The reference overlaps destination writes with the next batch's
accumulation: one ``pending_flush_result`` may be in flight; dispatching
the next batch first settles it, and durable progress (flush LSN) only
advances when the destination acknowledges.

Spark shape: :class:`AsyncFlushSink` wraps any :class:`Sink` with a
single-thread executor. ``write_changes``/``truncate`` dispatch and
return immediately; overlap is confined WITHIN one micro-batch — table
k+1's routing/decode planning (driver-side Spark jobs: truncate probe,
isEmpty check) runs while table k's write executes on the flush thread.
The pipeline settles every dispatched job (:meth:`await_pending`) before
``foreachBatch`` returns. That boundary is load-bearing for
at-least-once: Spark's streaming commit log marks a batch done the
moment ``foreachBatch`` returns, so a write still in flight at return
time would be unreplayable — a later failure loses the batch (the
restart resumes AFTER it). Cross-batch pipelining would need durable
progress tracked outside Spark's commit log; the reference can overlap
batch N's flush with batch N+1's accumulation precisely because its
restart point is the destination-acked flush LSN, not a source-side
offset log (apply.rs:1956-2023 gates the WAL restart LSN on ack).
A flush failure fails the micro-batch (stream error → restart replays
it from the checkpoint; idempotent sinks converge) — same semantics as
the reference, where per-table quarantine covers apply-time errors and
flush errors abort the loop.

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
        """AUXILIARY/TEST hook — not on the production path. The pipeline's
        durability gate is the settle-before-return contract: it calls
        :meth:`await_pending` before ``foreachBatch`` returns and advances
        the flush LSN afterward, on the caller thread. This hook remains
        for tests that assert ordering ON the flush thread: ``callback``
        runs after every job dispatched so far completes SUCCESSFULLY, in
        dispatch order; if any prior job failed, the callback is skipped
        and the failure re-raised in its place."""
        prior = list(self._pending)

        def _guarded():
            # on the serial pool every prior future has settled by now
            for f in prior:
                exc = f.exception()
                if exc is not None:
                    raise RuntimeError(
                        "durability callback skipped: a dispatched write failed"
                    ) from exc
            callback()

        self._pending.append(self._pool.submit(_guarded))

    # -- Sink ---------------------------------------------------------------
    def write_snapshot(self, table: str, df: DataFrame) -> None:
        # Settle anything already dispatched FIRST: backfill dispatches
        # truncate to the flush thread, then writes the snapshot on the
        # caller thread — without the barrier the truncate could run AFTER
        # the snapshot write and leave the destination empty while the
        # table is marked SYNC_DONE. (Synchronous otherwise: the copy path
        # is bulk-throughput bound, not latency-pipelined.)
        self.await_pending()
        self.inner.write_snapshot(table, df)

    def write_changes(self, table: str, df: DataFrame, batch_id: int) -> None:
        self._pending.append(
            self._pool.submit(self.inner.write_changes, table, df, batch_id)
        )

    def truncate(self, table: str) -> None:
        # ordered with respect to in-flight writes (truncate-then-write
        # sequencing inside a batch must survive the async boundary)
        self._pending.append(self._pool.submit(self.inner.truncate, table))

    def reconcile_keys(self, table: str, keys) -> None:
        self.inner.reconcile_keys(table, keys)

    def apply_schema_change(self, table, renames=None, drops=None,
                            defaults=None, nullability=None) -> None:
        # same serial-pool ordering as writes: the DDL must land after
        # every already-dispatched pre-DDL write — then SETTLE before
        # returning. The pipeline durably records the new schema version
        # in the registry immediately after this call on the caller
        # thread; if the DDL were still in flight at that point, a crash
        # after the registry save would replay the batch with the version
        # already recorded (the `not any(v == lsn ...)` guard skips the
        # re-apply) and the rename/drop would never reach the destination
        # — the silent NULL-under-rename data loss the Sink docstring
        # warns about. Sink-first/registry-second must hold through the
        # async boundary, so DDL is pipelined-in-order but synchronous.
        self._pending.append(
            self._pool.submit(
                self.inner.apply_schema_change, table, renames, drops, defaults,
                nullability,
            )
        )
        self.await_pending()

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
