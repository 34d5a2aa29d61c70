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
