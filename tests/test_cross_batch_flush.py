"""Cross-batch pipelined flush behind the destination-acked ledger
(T5 full form, apply.rs:1956-2023): batch N's flush overlaps batch N+1,
the flush LSN advances only on destination ack, and a crash landing
BETWEEN Spark's commit and the ack converges via ledger replay."""

from __future__ import annotations

import threading
import time

import pytest

from etl_spark.streaming.cross_batch_flush import CrossBatchFlushSink
from etl_spark.streaming.pipeline import Pipeline, TableConfig
from etl_spark.streaming.sinks import MemorySink, ParquetCurrentStateSink

PAYLOAD = "pk long, val string"


class SlowSink(MemorySink):
    def __init__(self, delay: float = 0.0):
        super().__init__()
        self.delay = delay
        self.started = threading.Event()

    def write_changes(self, table, df, batch_id):
        self.started.set()
        if self.delay:
            time.sleep(self.delay)
        super().write_changes(table, df, batch_id)


class BoomSink(MemorySink):
    """Destination that fails every write — the flush never acks."""

    def write_changes(self, table, df, batch_id):
        raise RuntimeError("destination down")


def test_flush_overlaps_next_batch(spark, tmp_path):
    """end_batch returns while the destination write is still running
    (the cross-batch overlap the within-batch sink can't have); the next
    begin_batch settles it — one in flight, like pending_flush_result."""
    inner = SlowSink(delay=0.3)
    sink = CrossBatchFlushSink(inner, str(tmp_path), spark)
    acked = []
    sink.on_acked = acked.append
    df = spark.createDataFrame([(1, "a")], PAYLOAD)

    sink.begin_batch(0, 100)
    sink.write_changes("t", df, 0)
    t0 = time.perf_counter()
    sink.end_batch()
    returned_in = time.perf_counter() - t0
    assert returned_in < 0.25          # did NOT wait for the 0.3s write
    assert acked == []                 # ack (and LSN advance) still pending

    sink.begin_batch(1, 200)           # settles batch 0 first
    assert acked == [100]              # destination acked → LSN advanced
    sink.write_changes("t", df, 1)
    sink.end_batch()
    sink.shutdown()
    assert acked == [100, 200]
    assert [b for _, b, _ in inner.batches] == [0, 1]


def test_crash_between_commit_and_ack_replays_from_ledger(spark, tmp_path):
    """THE failpoint this design exists for: Spark's commit log marks the
    batch done (foreachBatch returned via end_batch), the destination
    write then FAILS, and the process dies before any settle. A restart
    cannot replay from the checkpoint (the stream resumes after the
    batch) — recovery must come from the ledger's staged payloads."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], PAYLOAD)

    sink1 = CrossBatchFlushSink(BoomSink(), str(tmp_path), spark)
    sink1.begin_batch(7, 700)
    sink1.write_changes("t", df, 7)
    sink1.end_batch()            # "foreachBatch returned": commit log ahead
    # simulated crash: no settle, instance abandoned (drain the pool so the
    # test process exits cleanly; the FAILED op is what recovery sees)
    sink1._pool.shutdown(wait=True)

    # restart: new instance over the same work_dir, destination healthy
    inner2 = MemorySink()
    sink2 = CrossBatchFlushSink(inner2, str(tmp_path), spark)
    acked = []
    sink2.on_acked = acked.append
    replayed = sink2.recover()
    assert replayed == [7]
    assert acked == [700]        # flush LSN advances only now, on real ack
    (table, batch_id, rows) = inner2.batches[0]
    assert table == "t" and batch_id == 7
    assert sorted((r.pk, r.val) for r in rows) == [(1, "a"), (2, "b")]
    assert sink2.ledger.unacked_batches() == []
    sink2.recover()              # idempotent: nothing left to replay
    assert len(inner2.batches) == 1
    sink2.shutdown()


def test_crash_after_flush_before_marker_does_not_double_apply(spark, tmp_path):
    """If the destination write COMPLETED (per-op ack recorded) but the
    crash lands before the batch marker, recovery must not re-apply the
    acked op — it only closes out the batch and advances the LSN."""
    df = spark.createDataFrame([(3, "c")], PAYLOAD)
    inner1 = MemorySink()
    sink1 = CrossBatchFlushSink(inner1, str(tmp_path), spark)
    sink1.begin_batch(9, 900)
    sink1.write_changes("t", df, 9)
    # wait for the flush to ack the op, then "crash" before end_batch
    for f in sink1._current["futures"]:
        f.result()
    assert len(inner1.batches) == 1
    sink1._pool.shutdown(wait=True)

    inner2 = MemorySink()
    sink2 = CrossBatchFlushSink(inner2, str(tmp_path), spark)
    acked = []
    sink2.on_acked = acked.append
    assert sink2.recover() == [9]
    assert inner2.batches == []  # acked op NOT re-applied
    assert acked == [900]
    sink2.shutdown()


def test_replay_preserves_truncate_then_write_order(spark, tmp_path):
    """A replayed batch applies its ops in dispatch order: the truncate
    recorded before a write must land before it on recovery too."""
    df = spark.createDataFrame([(5, "e")], PAYLOAD)

    class BoomBothSink(BoomSink):
        # destination down for BOTH ops, so neither acks pre-crash and
        # recovery must replay the full ordered sequence
        def truncate(self, table):
            raise RuntimeError("destination down")

    sink1 = CrossBatchFlushSink(BoomBothSink(), str(tmp_path), spark)
    sink1.begin_batch(2, 200)
    sink1.truncate("t")          # in-batch: becomes a ledger op
    sink1.write_changes("t", df, 2)
    sink1.end_batch()
    sink1._pool.shutdown(wait=True)

    class OrderSink(MemorySink):
        def __init__(self):
            super().__init__()
            self.order = []

        def truncate(self, table):
            super().truncate(table)
            self.order.append("truncate")

        def write_changes(self, table, df, batch_id):
            super().write_changes(table, df, batch_id)
            self.order.append("write")

    inner2 = OrderSink()
    sink2 = CrossBatchFlushSink(inner2, str(tmp_path), spark)
    assert sink2.recover() == [2]
    assert inner2.order == ["truncate", "write"]
    sink2.shutdown()


def test_pipeline_end_to_end_with_cross_batch_sink(spark, tmp_path):
    """Full pipeline over the cross-batch sink: end state equals the
    synchronous result and the flush LSN lands on the last commit —
    advanced by the destination ack, not by foreachBatch return."""
    import json
    import os
    import shutil

    from pyspark.sql import Row

    from etl_spark.envelope import GENERIC_ENVELOPE

    def _ev(op, commit, after=None, before=None, kind=None):
        return Row(
            op=op, table="users", commit_lsn=commit, start_lsn=commit,
            tx_ordinal=0,
            after=json.dumps(after) if after else None,
            before=json.dumps(before) if before else None,
            before_kind=kind, missing_cols=None, schema_snapshot_lsn=None,
        )

    src = str(tmp_path / "env")
    os.makedirs(src)
    staging = os.path.join(src, ".__stage")
    spark.createDataFrame([
        _ev("INSERT", 10, after={"pk": 1, "val": "a"}),
        _ev("INSERT", 10, after={"pk": 2, "val": "b"}),
        _ev("UPDATE", 11, after={"pk": 1, "val": "a2"}),
        _ev("DELETE", 12, before={"pk": 2}, kind="KEY"),
    ], schema=GENERIC_ENVELOPE).coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    shutil.move(os.path.join(staging, part), os.path.join(src, "b1.parquet"))
    shutil.rmtree(staging)

    snap = str(tmp_path / "snap")
    spark.createDataFrame([], PAYLOAD).write.parquet(snap)
    inner = ParquetCurrentStateSink(str(tmp_path / "sink"), keys=["pk"], spark=spark)
    sink = CrossBatchFlushSink(inner, str(tmp_path / "work"), spark)
    cfg = TableConfig(name="users", snapshot_path=snap, keys=["pk"],
                      payload_schema=PAYLOAD)
    p = Pipeline(spark, src, [cfg], sink, str(tmp_path / "work"))
    p.run_until_drained()
    got = {r.pk: r.val for r in sink.read("users").select("pk", "val").collect()}
    assert got == {1: "a2"}
    assert p.status()["flush_lsn"] == 12
    sink.shutdown()


def test_crash_replays_ddl_then_write_in_order(spark, tmp_path):
    """A batch whose DDL (rename) and post-DDL write both died unacked
    must replay IN ORDER from the ledger: the rename lands before the
    write that carries the new column name — otherwise the bucket sink
    would merge mismatched schemas. Exercises the 'ddl' ledger op kind
    end-to-end against a real ParquetCurrentStateSink."""
    state_root = str(tmp_path / "state")
    seed = ParquetCurrentStateSink(state_root, keys=["pk"], spark=spark)
    from etl_spark.envelope import with_sequence

    seed.write_snapshot("t", with_sequence(spark.createDataFrame(
        [("INSERT", 1, 0, 1, "a")],
        "op string, commit_lsn long, tx_ordinal long, pk long, val string")))

    class AllBoom(BoomSink):
        def apply_schema_change(self, table, renames=None, drops=None,
                                defaults=None):
            raise RuntimeError("destination down")

    sink1 = CrossBatchFlushSink(AllBoom(), str(tmp_path / "wd"), spark)
    sink1.begin_batch(3, 300)
    sink1.apply_schema_change("t", renames=[("val", "amount")])
    post = with_sequence(spark.createDataFrame(
        [("UPDATE", 2, 0, 1, "a2")],
        "op string, commit_lsn long, tx_ordinal long, pk long, amount string"))
    sink1.write_changes("t", post, 3)
    sink1.end_batch()
    sink1._pool.shutdown(wait=True)  # simulated crash, nothing acked

    inner2 = ParquetCurrentStateSink(state_root, keys=["pk"], spark=spark)
    sink2 = CrossBatchFlushSink(inner2, str(tmp_path / "wd"), spark)
    acked = []
    sink2.on_acked = acked.append
    assert sink2.recover() == [3]
    assert acked == [300]
    got = {r.pk: r.amount for r in inner2.read("t").select("pk", "amount").collect()}
    assert got == {1: "a2"}
    assert "val" not in inner2.read("t").columns
    sink2.shutdown()
