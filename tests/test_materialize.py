"""Materialization semantics tests — the FIXTURES.md §3 scenario list
(insert-only, LWW, same-tx ordering, delete, PK-change, TOAST partial,
truncate, replay idempotence)."""

from pyspark.sql import functions as F

from etl_spark.envelope import with_sequence
from etl_spark.operators import materialize


def env_df(spark, rows):
    """rows: (op, pk, commit_lsn, tx_ordinal, value)"""
    df = spark.createDataFrame(
        rows, "op string, pk long, commit_lsn long, tx_ordinal long, value string"
    )
    return with_sequence(df.withColumn("table", F.lit("t")), start_lsn="absent")


def state(df):
    return {r.pk: (r.op, r.value) for r in df.collect()}


def test_insert_only(spark):
    df = env_df(spark, [("INSERT", 1, 1, 0, "a"), ("INSERT", 2, 1, 1, "b")])
    cur = materialize.current_state(df, ["pk"])
    assert state(cur) == {1: ("INSERT", "a"), 2: ("INSERT", "b")}


def test_lww_across_transactions(spark):
    df = env_df(spark, [
        ("INSERT", 1, 1, 0, "v1"),
        ("UPDATE", 1, 3, 0, "v3"),
        ("UPDATE", 1, 2, 0, "v2"),  # out-of-arrival-order delivery
    ])
    cur = materialize.current_state(df, ["pk"])
    assert state(cur) == {1: ("UPDATE", "v3")}


def test_same_transaction_ordering(spark):
    df = env_df(spark, [
        ("INSERT", 1, 5, 0, "a"),
        ("UPDATE", 1, 5, 2, "c"),
        ("UPDATE", 1, 5, 1, "b"),
    ])
    cur = materialize.current_state(df, ["pk"])
    assert state(cur) == {1: ("UPDATE", "c")}  # tx_ordinal breaks the tie


def test_delete_tombstone(spark):
    df = env_df(spark, [
        ("INSERT", 1, 1, 0, "a"),
        ("DELETE", 1, 2, 0, None),
        ("INSERT", 2, 2, 1, "b"),
    ])
    cur = materialize.current_state(df, ["pk"])
    assert state(cur) == {2: ("INSERT", "b")}


def test_changelog_is_lossless(spark):
    df = env_df(spark, [("INSERT", 1, 1, 0, "a"), ("DELETE", 1, 2, 0, None)])
    log = materialize.changelog(df)
    assert log.count() == 2
    ops = [r.cdc_operation for r in log.orderBy("cdc_sequence").collect()]
    assert ops == ["INSERT", "DELETE"]


def test_toast_resolution(spark):
    df = env_df(spark, [
        ("INSERT", 1, 1, 0, "full"),
        ("UPDATE", 1, 2, 0, None),   # partial: value unchanged-toast
        ("UPDATE", 1, 3, 0, "new"),
        ("UPDATE", 1, 4, 0, None),   # partial again
    ])
    resolved = materialize.resolve_toast(df, ["pk"], ["value"])
    cur = materialize.current_state(resolved, ["pk"])
    assert state(cur) == {1: ("UPDATE", "new")}
    mid = {r.tx: r.value for r in resolved.selectExpr("commit_lsn as tx", "value").collect()}
    assert mid[2] == "full"  # filled from prior image (codec/event.rs:594-680)


def test_null_out_missing(spark):
    df = env_df(spark, [("UPDATE", 1, 1, 0, "x")]).withColumn(
        "missing_cols", F.array(F.lit(0))
    )
    out = materialize.null_out_missing(df, ["value"])
    assert out.collect()[0].value is None


def test_pk_change_expansion(spark):
    df = env_df(spark, [
        ("INSERT", 1, 1, 0, "a"),
        ("UPDATE", 2, 2, 0, "a-moved"),  # moved 1 → 2
    ]).withColumn(
        "before_pk", F.when(F.col("commit_lsn") == 2, F.lit(1)).otherwise(F.col("pk"))
    )
    out = materialize.expand_pk_change(df, ["pk"])
    cur = materialize.current_state(out, ["pk"], tie_breakers=["sub_ordinal"])
    assert state(cur) == {2: ("UPDATE", "a-moved")}  # key 1 deleted


def test_truncate_high_water(spark):
    df = env_df(spark, [
        ("INSERT", 1, 1, 0, "old"),
        ("TRUNCATE", None, 2, 0, None),
        ("INSERT", 2, 3, 0, "new"),
    ])
    alive = materialize.apply_truncates(df)
    rows = alive.filter(F.col("op").isin("INSERT", "UPDATE", "DELETE"))
    cur = materialize.current_state(rows, ["pk"])
    assert state(cur) == {2: ("INSERT", "new")}


def test_merge_replay_idempotent(spark):
    """At-least-once delivery: applying the same batch twice == once
    (SURVEY T7)."""
    base = env_df(spark, [("INSERT", 1, 1, 0, "a")])
    target = materialize.current_state(base, ["pk"])
    batch = env_df(spark, [("UPDATE", 1, 2, 0, "b"), ("INSERT", 2, 2, 1, "c")])
    once = materialize.merge_current_state(target, batch, ["pk"])
    twice = materialize.merge_current_state(once, batch, ["pk"])
    assert state(once) == state(twice) == {1: ("UPDATE", "b"), 2: ("INSERT", "c")}


def test_merge_stale_batch_does_not_clobber(spark):
    target = materialize.current_state(
        env_df(spark, [("UPDATE", 1, 9, 0, "newest")]), ["pk"]
    )
    stale = env_df(spark, [("UPDATE", 1, 3, 0, "stale")])
    merged = materialize.merge_current_state(target, stale, ["pk"])
    assert state(merged) == {1: ("UPDATE", "newest")}
