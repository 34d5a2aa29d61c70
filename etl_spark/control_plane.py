"""Control-plane verbs over pipelines (SURVEY §2.12).

The reference exposes its pipeline lifecycle as an HTTP API
(`crates/etl-api/src/routes/pipelines.rs`: create / read / update /
delete / read_all / validate / start / stop / stop-all / restart /
version get+update / status / replication-status / rollback-tables).
This module is the library-level equivalent: a durable
:class:`PipelineRegistry` holding declarative pipeline configs, with the
same verb set operating on them. No HTTP framework — the verbs are the
contract; any REST shim is a thin wrapper.

Config is DECLARATIVE (JSON-serializable) so the registry can persist
and rebuild runtime pipelines: the sink is named by kind + parameters
(the reference stores destination configs the same way), tables carry
key/schema/filter specs. ``start`` materializes a
:class:`~etl_spark.streaming.pipeline.Pipeline` from the config; the
registry tracks the live instance for stop/status.

Guards mirror the reference:
- ``create`` enforces ``max_pipelines`` (MAX_PIPELINES_PER_TENANT,
  pipelines.rs:702) and validates the config;
- ``update``/``delete`` refuse while the pipeline runs (the reference
  checks ``is_replicator_active``);
- ``delete`` removes the durable work state too (the analog of deleting
  API state + source state + replication slots, pipelines.rs:922-931);
- ``rollback_tables`` maps to the pipeline's retry/resync verbs with an
  explicit target, like RollbackTablesTarget (pipelines.rs:554-565).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import SparkSession

#: reference MAX_PIPELINES_PER_TENANT default
MAX_PIPELINES = 10


class ControlPlaneError(Exception):
    pass


class PipelineNotFound(ControlPlaneError):
    pass


class PipelineActive(ControlPlaneError):
    pass


class InvalidConfig(ControlPlaneError):
    pass


def validate_config(config: dict) -> list[str]:
    """Static validation (POST /pipelines/validate): returns problem list
    (empty = valid). Checks the invariants the runtime would trip over."""
    problems = []
    if not config.get("source_dir"):
        problems.append("source_dir is required")
    tables = config.get("tables") or []
    if not tables:
        problems.append("at least one table is required")
    for t in tables:
        name = t.get("name") or "<unnamed>"
        if not t.get("name"):
            problems.append("table without a name")
        keys = t.get("keys") or []
        if not keys:
            problems.append(f"{name}: keys (replica identity) required")
        schema = t.get("payload_schema")
        if schema:
            cols = [f.strip().split()[0] for f in schema.split(",") if f.strip()]
            for k in keys:
                if k not in cols:
                    problems.append(f"{name}: key {k!r} missing from payload_schema")
    sink = config.get("sink") or {}
    kinds = ("parquet_current_state", "parquet_scd2", "parquet_changelog", "memory")
    if sink.get("kind") not in kinds:
        problems.append(f"unknown sink kind: {sink.get('kind')!r}")
    if sink.get("kind", "").startswith("parquet_") and not sink.get("root"):
        problems.append(f"{sink.get('kind')} sink requires root")
    return problems


def _build_sink(spec: dict, tables: list[dict], spark: SparkSession):
    """Materialize the declarative sink spec. Keyed sinks (current-state,
    SCD2) are built PER TABLE with that table's replica-identity keys —
    a multi-table pipeline whose tables declare different keys must never
    merge a non-first table on the first table's keys (the reference keeps
    one key mapping per table inside one destination)."""
    from etl_spark.streaming.sinks import (
        MemorySink,
        ParquetChangelogSink,
        ParquetCurrentStateSink,
        ParquetScd2Sink,
        TableRoutingSink,
    )

    if spec["kind"] == "memory":
        return MemorySink()
    if spec["kind"] == "parquet_changelog":
        return ParquetChangelogSink(spec["root"])
    cls = ParquetScd2Sink if spec["kind"] == "parquet_scd2" else ParquetCurrentStateSink
    per_table = {
        t["name"]: cls(
            spec["root"], keys=t["keys"], spark=spark,
            n_buckets=spec.get("n_buckets"),
        )
        for t in tables
    }
    if len(per_table) == 1:
        return next(iter(per_table.values()))
    return TableRoutingSink(per_table)


class PipelineRegistry:
    """Durable multi-pipeline registry + lifecycle verbs."""

    def __init__(self, root: str, max_pipelines: int = MAX_PIPELINES):
        self.root = root
        self.max_pipelines = max_pipelines
        os.makedirs(root, exist_ok=True)
        self._configs: dict[int, dict] = {}
        self._live: dict[int, object] = {}  # id → running Pipeline
        self._next_id = 1
        self._load()

    # -- persistence --------------------------------------------------------
    @property
    def _path(self) -> str:
        return os.path.join(self.root, "pipelines.json")

    def _load(self) -> None:
        try:
            with open(self._path) as f:
                raw = json.load(f)
            self._configs = {int(k): v for k, v in raw["pipelines"].items()}
            self._next_id = raw.get("next_id", max(self._configs, default=0) + 1)
        except FileNotFoundError:
            pass

    def _save(self) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root)
        with os.fdopen(fd, "w") as f:
            json.dump(
                {"pipelines": {str(k): v for k, v in self._configs.items()},
                 "next_id": self._next_id}, f, indent=1)
        os.replace(tmp, self._path)

    def _work_dir(self, pipeline_id: int) -> str:
        return os.path.join(self.root, f"pipeline_{pipeline_id}")

    # -- CRUD (POST/GET/POST/DELETE /pipelines[/{id}]) ----------------------
    def create_pipeline(self, config: dict) -> int:
        if len(self._configs) >= self.max_pipelines:
            raise ControlPlaneError(
                f"max pipelines reached ({self.max_pipelines})")
        problems = validate_config(config)
        if problems:
            raise InvalidConfig("; ".join(problems))
        pid = self._next_id
        self._next_id += 1
        self._configs[pid] = {"config": config, "version": 1}
        self._save()
        return pid

    def read_pipeline(self, pipeline_id: int) -> dict:
        if pipeline_id not in self._configs:
            raise PipelineNotFound(str(pipeline_id))
        entry = self._configs[pipeline_id]
        return {"id": pipeline_id, "version": entry["version"],
                "active": pipeline_id in self._live, **entry["config"]}

    def read_all_pipelines(self) -> list[dict]:
        return [self.read_pipeline(pid) for pid in sorted(self._configs)]

    def update_pipeline(self, pipeline_id: int, config: dict) -> int:
        """Replace the config; bumps the version. Refused while active
        (the reference checks is_replicator_active before updates)."""
        if pipeline_id not in self._configs:
            raise PipelineNotFound(str(pipeline_id))
        if pipeline_id in self._live:
            raise PipelineActive("stop the pipeline before updating it")
        problems = validate_config(config)
        if problems:
            raise InvalidConfig("; ".join(problems))
        entry = self._configs[pipeline_id]
        entry["config"] = config
        entry["version"] += 1
        self._save()
        return entry["version"]

    def delete_pipeline(self, pipeline_id: int) -> None:
        """Remove config AND durable work state (the analog of deleting
        API state + source state + replication slots,
        pipelines.rs:922-931)."""
        if pipeline_id not in self._configs:
            raise PipelineNotFound(str(pipeline_id))
        if pipeline_id in self._live:
            raise PipelineActive("stop the pipeline before deleting it")
        del self._configs[pipeline_id]
        shutil.rmtree(self._work_dir(pipeline_id), ignore_errors=True)
        self._save()

    # -- version (GET/POST /pipelines/{id}/version) -------------------------
    def get_version(self, pipeline_id: int) -> int:
        if pipeline_id not in self._configs:
            raise PipelineNotFound(str(pipeline_id))
        return self._configs[pipeline_id]["version"]

    # -- lifecycle ----------------------------------------------------------
    def _materialize(self, pipeline_id: int, spark: SparkSession):
        from etl_spark.streaming.pipeline import Pipeline, TableConfig

        cfg = self._configs[pipeline_id]["config"]
        tables = [
            TableConfig(
                name=t["name"], snapshot_path=t.get("snapshot_path"),
                keys=t["keys"], payload_schema=t.get("payload_schema"),
                row_filter=t.get("row_filter"),
            )
            for t in cfg["tables"]
        ]
        sink = _build_sink(cfg["sink"], cfg["tables"], spark)
        return Pipeline(
            spark, cfg["source_dir"], tables, sink,
            self._work_dir(pipeline_id),
            source_fmt=cfg.get("source_fmt", "envelope"),
        )

    def start_pipeline(self, pipeline_id: int, spark: SparkSession,
                       available_now: bool = True):
        if pipeline_id not in self._configs:
            raise PipelineNotFound(str(pipeline_id))
        if pipeline_id in self._live:
            raise PipelineActive("already running")
        p = self._materialize(pipeline_id, spark)
        self._live[pipeline_id] = p
        if available_now:
            # sim semantics: drain what exists, then the pipeline is idle
            # but stays registered as live until stop_pipeline
            p.run_until_drained()
        else:
            p.start(available_now=False)
        return p

    def stop_pipeline(self, pipeline_id: int) -> None:
        p = self._live.pop(pipeline_id, None)
        if p is None:
            raise PipelineNotFound(f"{pipeline_id} not running")
        p.stop()

    def stop_all_pipelines(self) -> list[int]:
        """POST /pipelines/stop — stop every running pipeline."""
        stopped = []
        for pid in list(self._live):
            self.stop_pipeline(pid)
            stopped.append(pid)
        return stopped

    def restart_pipeline(self, pipeline_id: int, spark: SparkSession):
        if pipeline_id in self._live:
            self.stop_pipeline(pipeline_id)
        return self.start_pipeline(pipeline_id, spark)

    # -- observability ------------------------------------------------------
    def pipeline_status(self, pipeline_id: int) -> dict:
        p = self._live.get(pipeline_id)
        if p is not None:
            return p.status()
        # not running: report durable state from the work dir
        from etl_spark.state import ControlStore

        if pipeline_id not in self._configs:
            raise PipelineNotFound(str(pipeline_id))
        store = ControlStore(os.path.join(self._work_dir(pipeline_id), "control"))
        return {
            "flush_lsn": store.flush_lsn,
            "tables": {t: e.state.value for t, e in store.tables.items()},
            "active": False,
        }

    def replication_status(self, pipeline_id: int) -> dict:
        p = self._live.get(pipeline_id)
        if p is None:
            raise PipelineNotFound(f"{pipeline_id} not running")
        return p.replication_status()

    def rollback_tables(self, pipeline_id: int, target: str = "errored",
                        force: bool = True) -> list[str]:
        """POST /pipelines/{id}/rollback-tables with an explicit target
        (RollbackTablesTarget, pipelines.rs:554-565): 'errored' resets
        quarantined tables for retry; 'all' re-syncs everything."""
        p = self._live.get(pipeline_id)
        if p is None:
            raise PipelineNotFound(f"{pipeline_id} not running")
        if target == "errored":
            return p.retry_errored(force=force)
        if target == "all":
            return p.resync_errored(force=force)
        raise InvalidConfig(f"unknown rollback target {target!r}")
