"""Compaction + version expiry (the reference's external maintenance,
ducklake/external_maintenance.rs) and streaming metrics listener (T4/A4
replication-status analog)."""

import os

import pytest

from etl_spark.maintenance import compact_parquet_dir, expire_versions, plan_compaction_partitions


def test_plan_compaction_partitions():
    mb = 1024 * 1024
    assert plan_compaction_partitions(10 * mb, target_mb=128) == 1
    assert plan_compaction_partitions(300 * mb, target_mb=128) == 3
    assert plan_compaction_partitions(0, target_mb=128) == 1


def test_compact_fragmented_dir(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(0, 10000).withColumnRenamed("id", "k")
    df.repartition(64).write.parquet(path)  # 64 tiny files
    before = spark.read.parquet(path).groupBy().sum("k").collect()[0][0]
    stats = compact_parquet_dir(spark, path, target_mb=128, sort_col="k")
    assert stats["files_before"] >= 32
    assert stats["files_after"] == 1  # tiny data → one 128MB-budget file
    after_df = spark.read.parquet(path)
    assert after_df.groupBy().sum("k").collect()[0][0] == before
    assert after_df.count() == 10000


def test_compact_is_atomic_swap(spark, tmp_path):
    # no leftover temp dirs after success
    path = str(tmp_path / "t")
    spark.range(0, 100).write.parquet(path)
    compact_parquet_dir(spark, path, target_mb=64)
    siblings = os.listdir(str(tmp_path))
    assert siblings == ["t"], siblings


def test_expire_versions_keeps_live(spark, tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    for v in range(5):
        spark.range(v, v + 10).write.parquet(os.path.join(root, f"v{v}"))
    removed = expire_versions(root, keep=2)
    assert removed == ["v0", "v1", "v2"]
    assert sorted(d for d in os.listdir(root) if d.startswith("v")) == ["v3", "v4"]
    # keep clamps to 1 — the live version can never be expired
    assert expire_versions(root, keep=0) == ["v3"]
    assert sorted(d for d in os.listdir(root) if d.startswith("v")) == ["v4"]


def test_metrics_listener_collects_progress(spark, tmp_path):
    import time

    from pyspark.sql import functions as F

    from etl_spark.streaming.metrics import PipelineMetrics

    src = str(tmp_path / "src")
    spark.range(0, 50).select(F.col("id")).write.parquet(src)
    m = PipelineMetrics()
    spark.streams.addListener(m)
    try:
        q = (
            spark.readStream.schema("id long").parquet(src)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener events are delivered async — poll briefly
        for _ in range(50):
            if m.snapshot()["total_rows"] >= 50:
                break
            time.sleep(0.2)
        snap = m.snapshot()
        assert snap["total_rows"] >= 50
        (qstats,) = snap["queries"].values()
        assert qstats["batches"] >= 1 and qstats["rows"] >= 50
    finally:
        spark.streams.removeListener(m)


def test_incremental_rollup_untouched_partitions_preserved(spark, tmp_path):
    from pyspark.sql import functions as F

    from etl_spark.streaming.rollup import IncrementalRollup

    path = str(tmp_path / "roll")
    roll = IncrementalRollup(spark, path, "b", ["g"], "v")
    df = lambda rows: spark.createDataFrame(rows, "b long, g string, v double")
    roll.update(df([(1, "x", 1.0), (1, "x", 2.0), (2, "y", 5.0)]))
    # second batch touches bucket 2 only — bucket 1's partition must not be
    # rewritten (its mtime is the cheap proxy) and its values must survive
    import os, time

    p1 = os.path.join(path, "b=1")
    before = max(os.path.getmtime(os.path.join(p1, f)) for f in os.listdir(p1))
    time.sleep(1.1)
    roll.update(df([(2, "y", 7.0)]))
    after = max(os.path.getmtime(os.path.join(p1, f)) for f in os.listdir(p1))
    assert after == before  # dynamic overwrite left bucket 1 alone
    got = {
        (r.b, r.g): (r.n, float(r.sum_value))
        for r in roll.read().collect()
    }
    assert got == {(1, "x"): (2, 3.0), (2, "y"): (2, 12.0)}
    # schema stays pinned across merge generations
    assert dict(roll.read().dtypes)["sum_value"] == "decimal(20,2)"


def test_compact_live_sink_version(spark, tmp_path):
    """Compacting the LIVE current-state version dir must preserve content
    and leave the VERSION pointer valid (the reference's external
    maintenance runs against live destination tables the same way)."""
    from etl_spark.maintenance import compact_parquet_dir
    from etl_spark.streaming.sinks import ParquetCurrentStateSink

    sink = ParquetCurrentStateSink(str(tmp_path / "wh"), keys=["pk"], spark=spark)
    df = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "pk long, val string")
    sink.write_snapshot("t", df.repartition(16))  # fragmented snapshot
    v = sink._current_version("t")
    stats = compact_parquet_dir(spark, sink._data_dir("t", v), target_mb=128, sort_col="pk")
    assert stats["files_after"] < stats["files_before"]
    assert sink._current_version("t") == v  # pointer untouched
    got = {r.pk: r.val for r in sink.read("t").collect()}
    assert got == {i: f"v{i}" for i in range(100)}
