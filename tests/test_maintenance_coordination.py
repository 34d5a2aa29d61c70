"""External-maintenance pause-lease coordination (the
crates/etl-maintenance/src/coordination.rs protocol): request outcomes,
the running→pausing→quiesced handshake, lease-expiry crash safety, the
replicator-side policy clamp, watcher thresholds + cooldown, and a full
coordinated run that drives the REAL maintenance verbs on a bucketed
sink."""

from __future__ import annotations

import pytest

from etl_spark.maintenance_coordination import (
    ALREADY_COVERED,
    CREATED,
    MISSING_STATE,
    PAUSING,
    QUIESCED,
    REJECTED_ACTIVE_RUN,
    FileMaintenanceStore,
    MaintenanceController,
    OperationRequest,
    Operations,
    ReplicatorMaintenanceParticipant,
    WatcherConfig,
)


def _store(tmp_path) -> FileMaintenanceStore:
    s = FileMaintenanceStore(str(tmp_path / "maint.json"))
    s.initialize()
    return s


def _req(now=0.0, **flags) -> OperationRequest:
    return OperationRequest(operations=Operations(**flags), requested_at=now)


def test_request_outcomes_matrix(tmp_path):
    missing = FileMaintenanceStore(str(tmp_path / "absent.json"))
    assert missing.request_operations(_req(inline_flush=True)) == MISSING_STATE

    s = _store(tmp_path)
    assert s.request_operations(_req(inline_flush=True)) == CREATED
    # a pending superset covers a subset ask
    assert s.request_operations(_req(inline_flush=True)) == ALREADY_COVERED
    # a WIDER ask replaces the pending request
    assert s.request_operations(
        _req(inline_flush=True, expire_snapshots=True)) == CREATED
    # active run blocks new requests
    ctl = MaintenanceController(s)
    assert ctl.begin_run("r1", lease_seconds=60, now=0.0) is not None
    assert s.request_operations(_req(inline_flush=True)) == REJECTED_ACTIVE_RUN


def test_handshake_running_pausing_quiesced(tmp_path):
    s = _store(tmp_path)
    s.request_operations(_req(rewrite_data_files=True))
    ctl = MaintenanceController(s)
    rep = ReplicatorMaintenanceParticipant(s)

    assert rep.on_batch_boundary(now=0.0) is False  # no lease yet
    ops = ctl.begin_run("r1", lease_seconds=100, now=1.0)
    assert ops.rewrite_data_files and not ops.inline_flush

    assert rep.on_batch_boundary(now=2.0) is True  # acknowledges
    assert s.load_state().replicator.state == PAUSING
    assert rep.on_batch_boundary(now=3.0) is True  # drains → quiesced
    st = s.load_state()
    assert st.replicator.state == QUIESCED
    assert st.replicator.observed_run_id == "r1"
    assert st.replicator.quiesced_at == 3.0
    assert ctl.replicator_quiesced("r1")

    ctl.complete_run("r1", ["rewrite_data_files"], now=4.0)
    st = s.load_state()
    assert st.active_run is None and st.pause_request is None
    assert st.last_completed_at == 4.0
    assert st.last_successful_operations["rewrite_data_files"]["run_id"] == "r1"
    # replicator resumes on the next boundary
    assert rep.on_batch_boundary(now=5.0) is False
    assert s.load_state().replicator.state == "running"


def test_lease_expiry_resumes_without_controller(tmp_path):
    """A runner that dies after taking the lease can never wedge the
    pipeline: past expires_at the lease is void and the replicator
    resumes on its own."""
    s = _store(tmp_path)
    s.request_operations(_req(inline_flush=True))
    ctl = MaintenanceController(s)
    ctl.begin_run("dead", lease_seconds=10, now=0.0)
    rep = ReplicatorMaintenanceParticipant(s)
    assert rep.on_batch_boundary(now=1.0) is True
    assert rep.on_batch_boundary(now=2.0) is True  # quiesced
    # controller crashes here — no complete_run. Lease expires at t=10.
    assert rep.on_batch_boundary(now=10.1) is False
    assert s.load_state().replicator.state == "running"


def test_replicator_policy_clamps_oversized_lease(tmp_path):
    """The replicator trusts a lease only up to its OWN
    max_duration_seconds from requested_at — a controller asking for
    hours cannot exceed the local clamp."""
    s = _store(tmp_path)
    s.request_operations(_req(inline_flush=True))
    MaintenanceController(s).begin_run("r1", lease_seconds=100000, now=0.0)
    rep = ReplicatorMaintenanceParticipant(s, max_pause_seconds=30)
    assert rep.on_batch_boundary(now=1.0) is True
    assert rep.on_batch_boundary(now=29.0) is True
    assert rep.on_batch_boundary(now=31.0) is False  # clamp kicked in


def test_watcher_thresholds_and_cooldown(tmp_path):
    s = _store(tmp_path)
    rep = ReplicatorMaintenanceParticipant(s)
    cfg = WatcherConfig(inline_flush_min_inlined_bytes=1000,
                        rewrite_data_files_min_active_data_files=50,
                        request_cooldown_seconds=600)
    # below both thresholds: no request
    assert rep.sample_pressure(10, 5, cfg, now=0.0) is None
    # inlined bytes over threshold: inline_flush requested
    assert rep.sample_pressure(2000, 5, cfg, now=0.0) == CREATED
    st = s.load_state()
    assert st.operation_request.operations.inline_flush
    assert not st.operation_request.operations.rewrite_data_files
    # complete a run, then the cooldown suppresses re-requests
    ctl = MaintenanceController(s)
    ctl.begin_run("r1", lease_seconds=60, now=1.0)
    ctl.complete_run("r1", ["inline_flush"], now=2.0)
    assert rep.sample_pressure(2000, 5, cfg, now=100.0) is None  # in cooldown
    assert rep.sample_pressure(2000, 100, cfg, now=700.0) == CREATED
    st = s.load_state()
    assert st.operation_request.operations.rewrite_data_files  # both now


def test_full_run_drives_real_maintenance_verbs(tmp_path, spark):
    """End-to-end: the coordinated run executes the engine's REAL
    compaction + version-expiry verbs (the same ones
    tests/test_maintenance.py drives directly) while the simulated
    pipeline is quiesced, and the data is intact afterwards."""
    import os

    from etl_spark.maintenance import compact_parquet_dir, expire_versions

    frag = str(tmp_path / "frag")
    spark.range(0, 5000).withColumnRenamed("id", "k").repartition(
        32).write.parquet(frag)
    vroot = str(tmp_path / "tbl")
    os.makedirs(vroot)
    for v in range(4):
        spark.range(v, v + 5).write.parquet(os.path.join(vroot, f"v{v}"))

    s = _store(tmp_path)
    s.request_operations(_req(merge_adjacent_files=True,
                              expire_snapshots=True))
    rep = ReplicatorMaintenanceParticipant(s)
    ctl = MaintenanceController(s)
    done = ctl.run(
        "run-e2e",
        executors={
            "merge_adjacent_files": lambda: compact_parquet_dir(
                spark, frag, target_mb=128, sort_col="k"),
            "expire_snapshots": lambda: expire_versions(vroot, keep=2),
        },
        participant=rep,
    )
    assert set(done) == {"merge_adjacent_files", "expire_snapshots"}
    after = spark.read.parquet(frag)
    assert after.count() == 5000
    assert after.groupBy().sum("k").collect()[0][0] == 5000 * 4999 // 2
    assert sorted(d for d in os.listdir(vroot)
                  if d.startswith("v")) == ["v2", "v3"]
    st = s.load_state()
    assert st.active_run is None and st.pause_request is None
    assert set(st.last_successful_operations) == {
        "merge_adjacent_files", "expire_snapshots"}
    # failed op: not recorded in history, run still completes
    s.request_operations(_req(cleanup_old_files=True))
    def boom():
        raise RuntimeError("disk full")
    done = ctl.run("run-fail", executors={"cleanup_old_files": boom},
                   participant=rep)
    assert done == []
    st = s.load_state()
    assert "cleanup_old_files" not in st.last_successful_operations
    assert st.active_run is None  # lease released even on failure
