"""Incremental SCD2 destination (ParquetScd2Sink): per-batch version
maintenance must equal the batch cdc_scd2_history window over the full
event stream, survive replays, and handle DELETE-interleaved keys."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from etl_spark.envelope import GENERIC_ENVELOPE
from etl_spark.streaming.pipeline import Pipeline, TableConfig
from etl_spark.streaming.sinks import ParquetScd2Sink

PAYLOAD = "pk long, val string"


def _ev(op, commit, ordinal=0, after=None, before=None, kind=None):
    return Row(op=op, table="users", commit_lsn=commit, start_lsn=commit,
               tx_ordinal=ordinal,
               after=json.dumps(after) if after else None,
               before=json.dumps(before) if before else None,
               before_kind=kind, missing_cols=None, schema_snapshot_lsn=None)


def _write(spark, src, rows, name):
    staging = os.path.join(src, f".__stage_{name}")
    spark.createDataFrame(rows, schema=GENERIC_ENVELOPE) \
        .coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    shutil.move(os.path.join(staging, part), os.path.join(src, f"{name}.parquet"))
    shutil.rmtree(staging)


#: events spread over three micro-batch files; pk 1 tombstone-interleaved
#: (INSERT → UPDATE → DELETE → re-INSERT → UPDATE), pk 2 plain updates,
#: pk 3 ends deleted
B1 = [_ev("INSERT", 10, 0, after={"pk": 1, "val": "a"}),
      _ev("INSERT", 10, 1, after={"pk": 2, "val": "b"}),
      _ev("UPDATE", 11, 0, after={"pk": 1, "val": "a1"})]
B2 = [_ev("DELETE", 12, 0, before={"pk": 1}, kind="KEY"),
      _ev("INSERT", 13, 0, after={"pk": 3, "val": "c"}),
      _ev("UPDATE", 13, 1, after={"pk": 2, "val": "b1"})]
B3 = [_ev("INSERT", 14, 0, after={"pk": 1, "val": "a2"}),
      _ev("DELETE", 15, 0, before={"pk": 3}, kind="KEY"),
      _ev("UPDATE", 16, 0, after={"pk": 1, "val": "a3"})]


def _expected_versions(spark):
    """Batch-mode SCD2 (the cdc_scd2_history window) over ALL events."""
    rows = [(r.op, r.commit_lsn, r.tx_ordinal,
             json.loads(r.after or r.before or "{}").get("pk"),
             (json.loads(r.after) if r.after else {}).get("val"))
            for r in B1 + B2 + B3]
    df = spark.createDataFrame(
        rows, "op string, commit_lsn long, tx_ordinal long, pk long, val string")
    w = Window.partitionBy("pk").orderBy("commit_lsn", "tx_ordinal")
    h = (df.withColumn("valid_to", F.lead("commit_lsn").over(w))
         .filter(F.col("op") != "DELETE"))
    return {(r.pk, r.commit_lsn): (r.val, r.valid_to, r.valid_to is None)
            for r in h.collect()}


def test_incremental_scd2_equals_batch_window(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    snap = str(tmp_path / "snap")
    spark.createDataFrame([], PAYLOAD).write.parquet(snap)
    sink = ParquetScd2Sink(str(tmp_path / "sink"), keys=["pk"], spark=spark)
    cfg = TableConfig(name="users", snapshot_path=snap, keys=["pk"],
                      payload_schema=PAYLOAD)
    work = str(tmp_path / "work")

    # three separate pipeline incarnations = three micro-batches
    for i, batch in enumerate([B1, B2, B3]):
        _write(spark, src, batch, f"b{i}")
        Pipeline(spark, src, [cfg], sink, work).run_until_drained()

    got = {(r.pk, r.valid_from): (r.val, r.valid_to, bool(r.is_current))
           for r in sink.read("users").collect()}
    want = _expected_versions(spark)
    assert got == want
    # spot-check the tombstone-interleaved key: version at lsn 11 closed by
    # the DELETE at 12; re-insert at 14 closed by 16; lsn 16 is current
    assert got[(1, 11)] == ("a1", 12, False)
    assert got[(1, 14)] == ("a2", 16, False)
    assert got[(1, 16)][2] is True
    # a key whose history ends on DELETE has no current version
    assert not any(cur for (pk, _), (_, _, cur) in got.items() if pk == 3)


def test_scd2_sink_replay_idempotent(spark, tmp_path):
    """Re-applying a batch (at-least-once redelivery with a DIFFERENT
    batch_id, the hard case) changes nothing: the (key, event_seq) dedup
    absorbs it."""
    from etl_spark.envelope import with_sequence

    sink = ParquetScd2Sink(str(tmp_path / "sink"), keys=["pk"], spark=spark)
    sink.write_snapshot("users", spark.createDataFrame([(1, "a")], PAYLOAD))
    batch = with_sequence(spark.createDataFrame(
        [("UPDATE", 10, 0, 1, "a1"), ("INSERT", 11, 0, 2, "b")],
        "op string, commit_lsn long, tx_ordinal long, pk long, val string"))
    sink.write_changes("users", batch, batch_id=1)
    first = sorted(map(tuple, sink.read("users")
                       .select("pk", "valid_from", "val", "valid_to", "is_current")
                       .collect()))
    sink.write_changes("users", batch, batch_id=2)  # redelivery, new id
    second = sorted(map(tuple, sink.read("users")
                        .select("pk", "valid_from", "val", "valid_to", "is_current")
                        .collect()))
    assert first == second
