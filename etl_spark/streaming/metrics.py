"""Streaming metrics: per-batch progress via StreamingQueryListener.

The reference tracks transaction metrics (events per commit, flush
durations — apply.rs:2323-2332) and replication progress
(last_received_lsn / last_flush_lsn — apply.rs:249-300). The Spark-native
equivalent is the StreamingQueryListener: every micro-batch emits a
progress event with rows/sec, batch duration breakdown, and source offsets
(the LSN analog) — no instrumentation inside the hot path.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class PipelineMetrics(StreamingQueryListener):
    """Collects per-batch throughput + offset progress for one session.

    Keeps a bounded in-memory history (driver-side, metadata-sized — one
    dict per micro-batch, never row data). ``snapshot()`` mirrors the
    reference's replication-status verb: rows processed, rates, and the
    latest committed source offsets per query.
    """

    def __init__(self, max_history: int = 256):
        self.max_history = max_history
        self.batches: list[dict] = []
        self.started: dict[str, str] = {}
        self.terminated: dict[str, str | None] = {}

    # -- listener hooks ----------------------------------------------------
    def onQueryStarted(self, event) -> None:
        self.started[str(event.id)] = event.name or str(event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.batches.append(
            {
                "query": p.name or str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "rows_per_sec": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs or {}),
                "end_offsets": [s.endOffset for s in (p.sources or [])],
            }
        )
        if len(self.batches) > self.max_history:
            del self.batches[: -self.max_history]

    def onQueryTerminated(self, event) -> None:
        self.terminated[str(event.id)] = getattr(event, "exception", None)

    def onQueryIdle(self, event) -> None:  # pragma: no cover - no-op hook
        pass

    # -- reference replication-status analog -------------------------------
    def snapshot(self) -> dict:
        total = sum(b["num_input_rows"] for b in self.batches)
        per_query: dict[str, dict] = {}
        for b in self.batches:
            q = per_query.setdefault(
                b["query"], {"batches": 0, "rows": 0, "last_offsets": None}
            )
            q["batches"] += 1
            q["rows"] += b["num_input_rows"]
            q["last_offsets"] = b["end_offsets"]
        return {"total_rows": total, "queries": per_query}
