"""Bucket-count migration (rebucket) for the bucket-manifest sinks.

``n_buckets`` is pinned at first write; a table that grows 100× needs
100× the buckets or every touched-bucket commit rewrites GBs. ``rebucket``
is the online migration: full rewrite hashed into the new count, manifest
pins it, one atomic VERSION swap — and every subsequent incremental batch
picks the new count up from the manifest."""

from __future__ import annotations

import json
import os

import pytest

from etl_spark.envelope import with_sequence
from etl_spark.maintenance import expire_versions
from etl_spark.streaming.sinks import ParquetCurrentStateSink, ParquetScd2Sink

SCHEMA = "op string, commit_lsn long, tx_ordinal long, pk long, val string"


def _batch(spark, rows, schema=SCHEMA):
    return with_sequence(spark.createDataFrame(rows, schema))


def _state(sink, table="t"):
    return {r["pk"]: r["val"] for r in sink.read(table).select("pk", "val").collect()}


@pytest.fixture()
def seeded(spark, tmp_path):
    sink = ParquetCurrentStateSink(
        str(tmp_path / "wh"), keys=["pk"], spark=spark, n_buckets=4
    )
    sink.write_snapshot(
        "t", _batch(spark, [("INSERT", 1, i, i, f"s{i}") for i in range(40)])
    )
    sink.write_changes(
        "t", _batch(spark, [("UPDATE", 2, 0, 3, "u3"), ("DELETE", 2, 1, 7, None)]),
        batch_id=0,
    )
    return sink


def test_rebucket_preserves_state_and_pins_count(spark, seeded, tmp_path):
    before = _state(seeded)
    seeded.rebucket("t", 16)
    assert _state(seeded) == before
    v = seeded._current_version("t")
    manifest = seeded._manifest("t", v)
    assert manifest["n_buckets"] == 16
    # every bucket entry points at the fresh dir, ids < 16
    assert set(manifest["buckets"].values()) == {f"v{v}"}
    assert all(0 <= int(b) < 16 for b in manifest["buckets"])


def test_incremental_writes_use_new_count_after_rebucket(spark, seeded):
    seeded.rebucket("t", 16)
    v_re = seeded._current_version("t")
    # a NEW sink instance (fresh process) with a different constructor
    # default must still merge at the manifest-pinned count
    sink2 = ParquetCurrentStateSink(seeded.root, keys=["pk"], spark=spark)
    sink2.write_changes(
        "t", _batch(spark, [("UPDATE", 3, 0, 3, "u3b"), ("INSERT", 3, 1, 99, "n99")]),
        batch_id=1,
    )
    got = _state(sink2)
    assert got[3] == "u3b" and got[99] == "n99" and got[0] == "s0"
    manifest = sink2._manifest("t", sink2._current_version("t"))
    assert manifest["n_buckets"] == 16
    # the incremental batch rewrote only its touched buckets
    untouched = [vd for vd in manifest["buckets"].values() if vd == f"v{v_re}"]
    assert untouched, "rebucketed buckets must carry forward untouched"


def test_rebucket_same_count_is_noop(spark, seeded):
    v0 = seeded._current_version("t")
    seeded.rebucket("t", 4)
    assert seeded._current_version("t") == v0  # idempotent replay


def test_rebucket_down_to_one(spark, seeded):
    before = _state(seeded)
    seeded.rebucket("t", 1)
    assert _state(seeded) == before
    manifest = seeded._manifest("t", seeded._current_version("t"))
    assert list(manifest["buckets"]) == ["0"]


def test_rebucket_rejects_bad_count(spark, seeded):
    with pytest.raises(ValueError):
        seeded.rebucket("t", 0)


def test_rebucket_after_rename_carries_ddl(spark, seeded):
    seeded.apply_schema_change("t", renames=[("val", "amount")])
    seeded.rebucket("t", 8)
    rows = {r["pk"]: r["amount"]
            for r in seeded.read("t").select("pk", "amount").collect()}
    assert rows[3] == "u3" and rows[0] == "s0"
    # the fresh dir was written at the post-rename epoch: reads must not
    # re-apply the rename to it
    m = seeded._manifest("t", seeded._current_version("t"))
    v = f'v{seeded._current_version("t")}'
    assert m["vdir_epoch"][v] == len(m["ddl_log"])


def test_expire_after_rebucket_reclaims_old_dirs(spark, seeded, tmp_path):
    before = _state(seeded)
    seeded.rebucket("t", 16)
    tdir = os.path.join(seeded.root, "t")
    removed = expire_versions(tdir, keep=1)
    assert removed, "superseded pre-rebucket dirs must be reclaimed"
    assert _state(seeded) == before


def test_scd2_rebucket_preserves_history(spark, tmp_path):
    sink = ParquetScd2Sink(
        str(tmp_path / "wh"), keys=["pk"], spark=spark, n_buckets=4
    )
    sink.write_snapshot(
        "t", _batch(spark, [("INSERT", 1, i, i, f"s{i}") for i in range(10)])
    )
    sink.write_changes(
        "t", _batch(spark, [("UPDATE", 2, 0, 1, "u1")]), batch_id=0
    )
    hist_before = sorted(
        (r["pk"], r["val"], r["is_current"]) for r in sink.read("t").collect()
    )
    sink.rebucket("t", 16)
    hist_after = sorted(
        (r["pk"], r["val"], r["is_current"]) for r in sink.read("t").collect()
    )
    assert hist_after == hist_before
    sink.write_changes(
        "t", _batch(spark, [("UPDATE", 3, 0, 1, "u1b")]), batch_id=1
    )
    cur = {r["pk"]: r["val"]
           for r in sink.read("t").filter("is_current").collect()}
    assert cur[1] == "u1b"
    versions = [r["val"] for r in sink.read("t")
                .filter("pk = 1").orderBy("valid_from").collect()]
    assert versions == ["s1", "u1", "u1b"]


def test_rebucket_crash_before_version_swap_is_invisible(spark, seeded):
    """A crash after the new vdir + manifest are written but BEFORE the
    VERSION swap leaves the torn version reader-invisible (VERSION is the
    one atomic commit); the retry re-attempts the same version number and
    mode=overwrite replaces the torn dir wholesale."""
    before = _state(seeded)
    v0 = seeded._current_version("t")
    real_point = seeded._point
    calls = {"n": 0}

    def crashing_point(table, version, batch_id):
        calls["n"] += 1
        raise RuntimeError("injected crash before VERSION swap")

    seeded._point = crashing_point
    with pytest.raises(RuntimeError):
        seeded.rebucket("t", 16)
    seeded._point = real_point
    # reader sees the OLD version and OLD bucket count untouched
    assert seeded._current_version("t") == v0
    assert seeded._manifest("t", v0)["n_buckets"] == 4
    assert _state(seeded) == before
    # retry completes: same content at the new count
    seeded.rebucket("t", 16)
    assert _state(seeded) == before
    assert seeded._manifest("t", seeded._current_version("t"))["n_buckets"] == 16
