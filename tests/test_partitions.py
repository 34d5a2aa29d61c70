"""Partitioned-table routing matrix, mirroring
crates/etl/tests/pipeline_with_partitioned_table.rs scenarios:

nested roots with/without publish_via_partition_root, root row filters
applying to leaves (filter_table_id), parent-vs-child TRUNCATE emission,
and detach → stop-replicating → re-resolve-on-restart.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark.operators import partitions

#: three-level tree: leaf → mid → top (the reference's "nested" cases)
TREE = {
    "public.t_leaf_a": "public.t_mid",
    "public.t_leaf_b": "public.t_mid",
    "public.t_mid": "public.t_top",
}

SCHEMA = "op string, table string, pk long, value double"


def _env(spark):
    rows = [
        ("INSERT", "public.t_leaf_a", 1, 5.0),
        ("INSERT", "public.t_leaf_b", 2, 50.0),
        ("INSERT", "public.t_mid", 3, 50.0),
        ("TRUNCATE", "public.t_leaf_a", None, None),  # child truncate
        ("TRUNCATE", "public.t_top", None, None),     # parent truncate
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_destination_resolution_nested():
    pub_top = {"public.t_top"}
    pub_mid = {"public.t_mid"}
    # top root published via root: everything in the subtree → top
    assert partitions.published_destination(TREE, pub_top, "public.t_leaf_a") == "public.t_top"
    assert partitions.published_destination(TREE, pub_top, "public.t_mid") == "public.t_top"
    # middle root published: subtree → mid, top itself unroutable
    assert partitions.published_destination(TREE, pub_mid, "public.t_leaf_b") == "public.t_mid"
    assert partitions.published_destination(TREE, pub_mid, "public.t_top") is None
    # without via-root, only directly-published tables replicate, as themselves
    assert (
        partitions.published_destination(TREE, pub_mid, "public.t_leaf_a", via_partition_root=False)
        is None
    )
    assert (
        partitions.published_destination(
            TREE, {"public.t_leaf_a"}, "public.t_leaf_a", via_partition_root=False
        )
        == "public.t_leaf_a"
    )


def test_route_to_top_root_with_partition_root(spark):
    routed = partitions.route_events(_env(spark), TREE, {"public.t_top"})
    got = routed.filter(F.col("op") == "INSERT").select("table").distinct().collect()
    assert [r.table for r in got] == ["public.t_top"]


def test_route_leaf_without_partition_root(spark):
    routed = partitions.route_events(
        _env(spark), TREE, {"public.t_leaf_a"}, via_partition_root=False
    )
    rows = routed.filter(F.col("op") == "INSERT").collect()
    # only leaf_a's own event replicates, under its own identity
    assert [(r.table, r.pk) for r in rows] == [("public.t_leaf_a", 1)]


def test_truncate_child_suppressed_parent_emitted(spark):
    routed = partitions.route_events(_env(spark), TREE, {"public.t_top"})
    truncs = routed.filter(F.col("op") == "TRUNCATE").collect()
    # the child TRUNCATE vanished; the parent's survived, on the routed id
    assert [(r.op, r.table) for r in truncs] == [("TRUNCATE", "public.t_top")]


def test_detached_partition_stops_then_resumes(spark):
    env = _env(spark)
    detached = partitions.route_events(
        env, TREE, {"public.t_top"}, detached={"public.t_leaf_b"}
    )
    assert detached.filter(F.col("pk") == 2).count() == 0  # stopped
    # restart re-resolves membership without the detach → flows again
    resumed = partitions.route_events(env, TREE, {"public.t_top"})
    assert resumed.filter(F.col("pk") == 2).count() == 1


def test_root_row_filter_applies_to_leaves(spark):
    routed = partitions.route_events(
        _env(spark), TREE, {"public.t_top"},
        row_filters={"public.t_top": "value >= 10"},
    )
    rows = routed.filter(F.col("op") == "INSERT").collect()
    # pk=1 (value 5.0, from a LEAF) was filtered by the ROOT's predicate
    assert sorted(r.pk for r in rows) == [2, 3]
    # control events pass the filter untouched
    assert routed.filter(F.col("op") == "TRUNCATE").count() == 1


def test_delete_with_null_after_image_passes_filter(spark):
    """A DELETE's after-image columns are NULL — the after-image predicate
    must not silently drop it (stale destination row forever). Reference
    filters deletes against the OLD image where in scope
    (transaction.rs:51-55,654-690); absent a before-image predicate the
    DELETE passes through keyed by identity."""
    rows = [
        ("INSERT", "public.t_leaf_a", 1, 50.0),
        ("DELETE", "public.t_leaf_a", 1, None),  # after image absent
    ]
    env = spark.createDataFrame(rows, SCHEMA)
    routed = partitions.route_events(
        env, TREE, {"public.t_top"},
        row_filters={"public.t_top": "value >= 10"},
    )
    got = [(r.op, r.pk) for r in routed.collect()]
    assert ("DELETE", 1) in got  # NOT dropped by the NULL-valued predicate
    assert ("INSERT", 1) in got


def test_delete_filtered_by_before_image_predicate(spark):
    """When the caller supplies the predicate rewritten over before-image
    columns, DELETEs are filtered source-side exactly like the reference."""
    rows = [
        ("INSERT", "public.t_leaf_a", 1, 50.0),
        ("DELETE", "public.t_leaf_a", 1, None),   # matching row (before 50.0)
        ("DELETE", "public.t_leaf_b", 2, None),   # row never replicated
    ]
    schema = SCHEMA + ", before_value double"
    env = spark.createDataFrame(
        [r + (v,) for r, v in zip(rows, [None, 50.0, 5.0])], schema
    )
    routed = partitions.route_events(
        env, TREE, {"public.t_top"},
        row_filters={"public.t_top": "value >= 10"},
        delete_row_filters={"public.t_top": "before_value >= 10"},
    )
    got = [(r.op, r.pk) for r in routed.collect()]
    assert ("DELETE", 1) in got      # before image matched → replicated
    assert ("DELETE", 2) not in got  # before image below threshold → dropped
    assert ("INSERT", 1) in got
