"""Error taxonomy + retry/remediation policy (error.rs ErrorKind +
runtime/error_policy.rs build_error_handling_policy): kind → directive
mapping, remediation strings, builtin-exception classification, and the
pipeline quarantine actually carrying the policy into the control row."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import Row

from etl_spark.errors import (
    ErrorKind,
    EtlError,
    classify_exception,
    error_handling_policy,
)
from etl_spark.state import RetryPolicy


def test_timed_kinds_self_heal():
    for kind in (ErrorKind.SOURCE_CONNECTION_FAILED,
                 ErrorKind.DESTINATION_CONNECTION_FAILED,
                 ErrorKind.DESTINATION_ATOMIC_BATCH_RETRYABLE,
                 ErrorKind.DESTINATION_TIMEOUT,
                 ErrorKind.SOURCE_DATABASE_SHUTDOWN,
                 ErrorKind.SOURCE_DATABASE_IN_RECOVERY):
        policy, _ = error_handling_policy(EtlError(kind))
        assert policy == RetryPolicy.TIMED_RETRY, kind


def test_replica_identity_manual_with_specific_remediation():
    """The reference pins this exact arm in its own test suite
    (error_policy.rs tests): manual retry with the least-costly
    replica-identity guidance."""
    policy, solution = error_handling_policy(
        EtlError(ErrorKind.SOURCE_REPLICA_IDENTITY_ERROR, "users"))
    assert policy == RetryPolicy.MANUAL_RETRY
    assert "least costly replica identity" in solution
    assert "REPLICA IDENTITY FULL only" in solution


def test_failpoint_kinds_and_default_arm():
    policy, solution = error_handling_policy(EtlError(ErrorKind.WITH_NO_RETRY))
    assert policy == RetryPolicy.NO_RETRY
    assert solution == "Cannot retry this error."
    policy, solution = error_handling_policy(EtlError(ErrorKind.UNKNOWN))
    assert policy == RetryPolicy.MANUAL_RETRY
    assert "no single prescribed solution" in solution


def test_builtin_exception_classification():
    assert classify_exception(ConnectionError()) == \
        ErrorKind.SOURCE_CONNECTION_FAILED
    assert classify_exception(TimeoutError()) == ErrorKind.DESTINATION_TIMEOUT
    # PermissionError is an OSError subclass — must NOT fall into IoError
    assert classify_exception(PermissionError()) == ErrorKind.PERMISSION_DENIED
    assert classify_exception(OSError()) == ErrorKind.IO_ERROR
    assert classify_exception(ValueError()) == ErrorKind.INVALID_DATA
    assert classify_exception(RuntimeError("x")) == ErrorKind.UNKNOWN
    # a timed policy falls out of a raw ConnectionError too
    policy, _ = error_handling_policy(ConnectionError("refused"))
    assert policy == RetryPolicy.TIMED_RETRY


def test_pipeline_quarantine_carries_typed_policy(spark, tmp_path):
    """A destination raising a TYPED transient error quarantines the
    table with TimedRetry + the remediation text in the control row —
    retry_errored's timed path can then self-heal it; an untyped
    failure stays ManualRetry (the previous behavior)."""
    from etl_spark.envelope import GENERIC_ENVELOPE
    from etl_spark.streaming.pipeline import Pipeline, TableConfig
    from etl_spark.streaming.sinks import ParquetCurrentStateSink, Sink

    PAYLOAD = "pk long, val string"

    class TypedFlakySink(Sink):
        def __init__(self, inner, exc):
            self.inner, self.exc, self.armed = inner, exc, True

        def write_snapshot(self, table, df):
            self.inner.write_snapshot(table, df)

        def write_changes(self, table, df, batch_id):
            if self.armed:
                self.armed = False
                raise self.exc
            self.inner.write_changes(table, df, batch_id)

        def truncate(self, table):
            self.inner.truncate(table)

        def read(self, table):
            return self.inner.read(table)

    def build(tag, exc):
        source = str(tmp_path / f"src_{tag}")
        snap = str(tmp_path / f"snap_{tag}")
        os.makedirs(source, exist_ok=True)
        spark.createDataFrame([(1, "a")], PAYLOAD).write.mode(
            "overwrite").parquet(snap)
        ev = Row(op="INSERT", table="users", commit_lsn=10, start_lsn=10,
                 tx_ordinal=0, after=json.dumps({"pk": 2, "val": "b"}),
                 before=None, before_kind=None, missing_cols=None,
                 schema_snapshot_lsn=None)
        staging = os.path.join(source, ".__stage")
        spark.createDataFrame([ev], schema=GENERIC_ENVELOPE).coalesce(
            1).write.mode("overwrite").parquet(staging)
        part = next(f for f in os.listdir(staging)
                    if f.endswith(".parquet"))
        shutil.move(os.path.join(staging, part),
                    os.path.join(source, "b1.parquet"))
        shutil.rmtree(staging)
        inner = ParquetCurrentStateSink(
            str(tmp_path / f"sink_{tag}"), keys=["pk"], spark=spark)
        cfg = TableConfig(name="users", snapshot_path=snap, keys=["pk"],
                          payload_schema=PAYLOAD)
        pipe = Pipeline(spark, source, [cfg],
                        TypedFlakySink(inner, exc),
                        str(tmp_path / f"work_{tag}"))
        return pipe

    p = build("typed", EtlError(ErrorKind.DESTINATION_TIMEOUT, "sink stall"))
    p.run_until_drained()
    entry = p.control.get("users")
    assert entry.state.value == "Errored"
    assert entry.retry_policy == RetryPolicy.TIMED_RETRY
    assert "DestinationTimeout" in entry.error

    p2 = build("untyped", RuntimeError("who knows"))
    p2.run_until_drained()
    entry = p2.control.get("users")
    assert entry.state.value == "Errored"
    assert entry.retry_policy == RetryPolicy.MANUAL_RETRY
    assert "no single prescribed solution" in entry.error
