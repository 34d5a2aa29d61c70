"""Async pipelined flush (T5, apply.rs:1956-2023): one in-flight batch,
durability-gated progress, failure settles before the next dispatch,
and end-state equality with the synchronous path."""

from __future__ import annotations

import json
import os
import shutil
import threading
import time

import pytest
from pyspark.sql import Row

from etl_spark.streaming.async_flush import AsyncFlushSink
from etl_spark.streaming.pipeline import Pipeline, TableConfig
from etl_spark.streaming.sinks import MemorySink, ParquetCurrentStateSink, Sink

PAYLOAD = "pk long, val string"


class ProbeSink(MemorySink):
    """Records write concurrency + completion order."""

    def __init__(self, delay: float = 0.0):
        super().__init__()
        self.delay = delay
        self.active = 0
        self.max_active = 0
        self.order: list = []
        self._lock = threading.Lock()

    def write_changes(self, table, df, batch_id):
        with self._lock:
            self.active += 1
            self.max_active = max(self.max_active, self.active)
        try:
            if self.delay:
                time.sleep(self.delay)
            super().write_changes(table, df, batch_id)
            self.order.append(("write", batch_id))
        finally:
            with self._lock:
                self.active -= 1

    def truncate(self, table):
        super().truncate(table)
        self.order.append(("truncate", table))


def test_one_in_flight_and_order(spark):
    probe = ProbeSink(delay=0.05)
    sink = AsyncFlushSink(probe)
    df = spark.createDataFrame([(1, "a")], PAYLOAD)
    for b in range(3):
        sink.write_changes("t", df, b)
        sink.after_flush(lambda b=b: probe.order.append(("durable", b)))
        sink.await_pending()  # the pipeline's settle point
    assert probe.max_active == 1  # never concurrent
    assert probe.order == [
        ("write", 0), ("durable", 0),
        ("write", 1), ("durable", 1),
        ("write", 2), ("durable", 2),
    ]


def test_truncate_ordered_with_writes(spark):
    probe = ProbeSink()
    sink = AsyncFlushSink(probe)
    df = spark.createDataFrame([(1, "a")], PAYLOAD)
    sink.truncate("t")
    sink.write_changes("t", df, 0)
    sink.await_pending()
    assert probe.order == [("truncate", "t"), ("write", 0)]


def test_failure_surfaces_on_settle(spark):
    class Boom(MemorySink):
        def write_changes(self, table, df, batch_id):
            raise RuntimeError("flush failed")

    sink = AsyncFlushSink(Boom())
    df = spark.createDataFrame([(1, "a")], PAYLOAD)
    sink.write_changes("t", df, 0)  # returns immediately
    with pytest.raises(RuntimeError, match="flush failed"):
        sink.await_pending()
    sink.await_pending()  # settled errors are consumed, not sticky


def test_shutdown_drains(spark):
    probe = ProbeSink(delay=0.05)
    sink = AsyncFlushSink(probe)
    df = spark.createDataFrame([(2, "b")], PAYLOAD)
    sink.write_changes("t", df, 7)
    sink.shutdown()  # must block until the in-flight write lands
    assert any(bid == 7 for _, bid, _ in probe.batches)


def _ev(op, commit, after=None, before=None, kind=None):
    return Row(
        op=op, table="users", commit_lsn=commit, start_lsn=commit,
        tx_ordinal=0,
        after=json.dumps(after) if after else None,
        before=json.dumps(before) if before else None,
        before_kind=kind, missing_cols=None, schema_snapshot_lsn=None,
    )


def test_pipeline_async_flush_end_state_matches_sync(spark, tmp_path):
    """Same source, sync vs async pipeline → identical final state and
    flush LSN (progress advanced only via the durability callback)."""
    from etl_spark.envelope import GENERIC_ENVELOPE

    def build(tag, async_flush):
        source = str(tmp_path / f"src_{tag}")
        snap = str(tmp_path / f"snap_{tag}")
        os.makedirs(source, exist_ok=True)
        spark.createDataFrame([(1, "a"), (2, "b")], PAYLOAD) \
            .write.mode("overwrite").parquet(snap)
        for i, rows in enumerate([
            [_ev("INSERT", 10, after={"pk": 3, "val": "c"})],
            [_ev("UPDATE", 11, after={"pk": 1, "val": "a2"}),
             _ev("DELETE", 12, before={"pk": 2}, kind="KEY")],
        ]):
            staging = os.path.join(source, ".__stage")
            spark.createDataFrame(rows, schema=GENERIC_ENVELOPE) \
                .coalesce(1).write.mode("overwrite").parquet(staging)
            part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
            shutil.move(os.path.join(staging, part), os.path.join(source, f"b{i}.parquet"))
            shutil.rmtree(staging)
        inner = ParquetCurrentStateSink(str(tmp_path / f"sink_{tag}"), keys=["pk"], spark=spark)
        cfg = TableConfig(name="users", snapshot_path=snap, keys=["pk"], payload_schema=PAYLOAD)
        p = Pipeline(spark, source, [cfg], inner, str(tmp_path / f"work_{tag}"),
                     async_flush=async_flush)
        # one file per trigger → the two batches actually pipeline
        q = p.start(available_now=True, max_files_per_trigger=1)
        q.awaitTermination()
        if async_flush:
            p.sink.await_pending()  # drain the tail batch's flush
        read = p.sink.read if not async_flush else p.sink.inner.read
        state = {r.pk: r.val for r in read("users").select("pk", "val").collect()}
        return state, p.status()["flush_lsn"]

    sync_state, sync_lsn = build("sync", async_flush=False)
    async_state, async_lsn = build("async", async_flush=True)
    assert async_state == sync_state == {1: "a2", 3: "c"}
    assert async_lsn == sync_lsn == 12


def test_ddl_settles_before_return(spark):
    """apply_schema_change must be SYNCHRONOUS through the async boundary:
    the pipeline records the new schema version in the registry right
    after the call on the caller thread, and a crash after that record
    replays the batch with the version-guard satisfied — an in-flight DDL
    at record time would then never reach the destination (the silent
    NULL-under-rename loss). The call still orders AFTER every dispatched
    pre-DDL write on the serial flush pool."""
    inner = ProbeSink(delay=0.2)
    sink = AsyncFlushSink(inner)
    df = spark.createDataFrame([(1, "a")], PAYLOAD)
    sink.write_changes("users", df, batch_id=0)  # slow, in flight
    sink.apply_schema_change("users", renames=[("val", "val2")])
    # on return: the pre-DDL write has completed AND the DDL has landed
    assert [b[1] for b in inner.batches] == [0]
    assert getattr(inner, "ddl", []) == [("users", [("val", "val2")], [], [])]
    assert sink._pending == []  # settled — registry record is now safe
    sink.shutdown()
