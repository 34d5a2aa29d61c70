"""Publication-catalog introspection fixtures (S5, round 12 — VERDICT r11
item #6): membership, column lists, and row filters driven from a
``pg_publication_tables`` snapshot instead of hand config, exercising the
same add/remove/purge and mask/filter paths
(transaction.rs:277-300,654-690; pipeline.rs:354-421 purge)."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import Row

from etl_spark.envelope import GENERIC_ENVELOPE
from etl_spark.publication import (
    PublicationCatalog,
    PublicationTableRow,
    apply_catalog_to_config,
)
from etl_spark.streaming.pipeline import Pipeline, TableConfig
from etl_spark.streaming.sinks import ParquetCurrentStateSink


def _ev(op, table, commit, ordinal, after=None, before=None, before_kind=None):
    return Row(
        op=op, table=table, commit_lsn=commit, start_lsn=commit,
        tx_ordinal=ordinal,
        after=json.dumps(after) if after else None,
        before=json.dumps(before) if before else None,
        before_kind=before_kind or ("FULL" if before else None),
        missing_cols=None, schema_snapshot_lsn=None,
    )


def _write_events(spark, path, rows, name):
    staging = os.path.join(path, f".__stage_{name}")
    df = spark.createDataFrame(rows, schema=GENERIC_ENVELOPE)
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    shutil.move(os.path.join(staging, part), os.path.join(path, f"{name}.parquet"))
    shutil.rmtree(staging)


# ---------------------------------------------------------------------------
# Fixture format
# ---------------------------------------------------------------------------


def test_catalog_fixture_roundtrip(tmp_path):
    rows = [
        {"pubname": "etl", "schemaname": "public", "tablename": "users",
         "rowfilter": "(val >= 10)", "attnames": ["pk", "val"]},
        {"pubname": "etl", "schemaname": "public", "tablename": "orders",
         "rowfilter": None, "attnames": None},
    ]
    cat = PublicationCatalog.from_rows(rows)
    assert cat.pubname == "etl"
    assert cat.tables() == {"public.users", "public.orders"}
    assert cat.row_for("public.users").rowfilter == "(val >= 10)"
    assert cat.row_for("public.orders").attnames is None
    assert cat.row_for("public.nope") is None
    p = str(tmp_path / "cat.json")
    cat.save_json(p)
    back = PublicationCatalog.load_json(p)
    assert back == cat


def test_catalog_fixture_rejects_blank_and_mixed():
    with pytest.raises(ValueError, match="empty catalog"):
        PublicationCatalog.from_rows([])
    with pytest.raises(ValueError, match="one fixture = one publication"):
        PublicationCatalog.from_rows([
            {"pubname": "a", "schemaname": "s", "tablename": "t"},
            {"pubname": "b", "schemaname": "s", "tablename": "u"},
        ])
    # explicit empty catalog is constructible (deliberate purge-all)
    assert PublicationCatalog("etl", rows=[]).tables() == set()


def test_column_list_trims_mask_and_keeps_keys():
    cfg = TableConfig(name="public.t", snapshot_path=None, keys=["pk"],
                      payload_schema="pk long, a string, b double")
    row = PublicationTableRow("etl", "public", "t", rowfilter="(a = 'x')",
                              attnames=["pk", "a"])
    apply_catalog_to_config(cfg, row)
    assert cfg.payload_schema == "pk long, a string"
    assert cfg.row_filter == "(a = 'x')"
    # NULL attnames = all columns published; filter cleared when absent
    apply_catalog_to_config(cfg, PublicationTableRow("etl", "public", "t"))
    assert cfg.payload_schema == "pk long, a string"
    assert cfg.row_filter is None


def test_column_list_missing_replica_identity_rejected():
    cfg = TableConfig(name="public.t", snapshot_path=None, keys=["k1", "k2"],
                      payload_schema="k1 long, k2 long, v string")
    row = PublicationTableRow("etl", "public", "t", attnames=["k1", "v"])
    with pytest.raises(ValueError, match="replica-identity column"):
        apply_catalog_to_config(cfg, row)


# ---------------------------------------------------------------------------
# Pipeline reconciliation matrix
# ---------------------------------------------------------------------------


def _mk(spark, tmp_path, names):
    source = str(tmp_path / "src")
    os.makedirs(source, exist_ok=True)
    sink = ParquetCurrentStateSink(str(tmp_path / "sink"), keys=["pk"],
                                   spark=spark)
    cfgs = []
    for n in names:
        snap = str(tmp_path / f"snap_{n.replace('.', '_')}")
        spark.createDataFrame([(1, 10, "s")], "pk long, val long, note string") \
            .write.mode("overwrite").parquet(snap)
        cfgs.append(TableConfig(name=n, snapshot_path=snap, keys=["pk"],
                                payload_schema="pk long, val long, note string"))
    pipe = Pipeline(spark, source, cfgs, sink, str(tmp_path / "work"))
    return pipe, sink, source


def test_reconcile_publication_full_matrix(spark, tmp_path):
    """One catalog snapshot drives all three membership effects at once:
    unlisted table purged, column list trims the live decode mask, row
    filter adopted, newly published table provisioned and backfilled."""
    pipe, sink, source = _mk(spark, tmp_path,
                             ["public.a", "public.b", "public.gone"])
    pipe.run_until_drained()
    assert set(pipe.control.tables) == {"public.a", "public.b", "public.gone"}

    snap_new = str(tmp_path / "snap_new")
    spark.createDataFrame([(7, 70, "n")], "pk long, val long, note string") \
        .write.parquet(snap_new)
    cat = PublicationCatalog.from_rows([
        {"pubname": "etl", "schemaname": "public", "tablename": "a",
         "rowfilter": None, "attnames": None},
        # b: note column unpublished + row filter
        {"pubname": "etl", "schemaname": "public", "tablename": "b",
         "rowfilter": "val >= 100", "attnames": ["pk", "val"]},
        {"pubname": "etl", "schemaname": "public", "tablename": "fresh",
         "rowfilter": None, "attnames": None},
    ])

    res = pipe.reconcile_publication(
        cat,
        provision=lambda row: TableConfig(
            name=row.qualified_name, snapshot_path=snap_new, keys=["pk"],
            payload_schema="pk long, val long, note string"),
    )
    assert res == {"removed": ["public.gone"], "updated": ["public.a", "public.b"],
                   "added": ["public.fresh"], "unprovisioned": []}
    # purge: state + destination gone (pipeline.rs:354-421 semantics)
    assert "public.gone" not in pipe.control.tables
    assert sink.read("public.gone").count() == 0
    assert pipe.tables["public.b"].payload_schema == "pk long, val long"
    assert pipe.tables["public.b"].row_filter == "val >= 100"

    # the new table backfills from its snapshot; streamed changes obey
    # the trimmed mask + adopted filter
    pipe.backfill()
    _write_events(spark, source, [
        _ev("UPDATE", "public.b", 20, 0,
            after={"pk": 1, "val": 500, "note": "published?"}),
        _ev("INSERT", "public.b", 21, 0, after={"pk": 2, "val": 5}),  # filtered
        _ev("INSERT", "public.fresh", 22, 0,
            after={"pk": 8, "val": 80, "note": "x"}),
    ], "b1")
    pipe.run_until_drained()

    b = {r.pk: r.asDict() for r in sink.read("public.b").collect()}
    assert b[1]["val"] == 500
    assert b[1].get("note") in (None, "s")  # unpublished column never decodes
    assert 2 not in b  # row filter dropped it
    fresh = {r.pk: r.val for r in sink.read("public.fresh").collect()}
    assert fresh == {7: 70, 8: 80}


def test_reconcile_publication_without_provision_reports(spark, tmp_path):
    pipe, _, _ = _mk(spark, tmp_path, ["public.a"])
    cat = PublicationCatalog.from_rows([
        {"pubname": "etl", "schemaname": "public", "tablename": "a"},
        {"pubname": "etl", "schemaname": "public", "tablename": "newb"},
    ])
    res = pipe.reconcile_publication(cat)
    assert res["unprovisioned"] == ["public.newb"]
    assert "public.newb" not in pipe.tables


def test_reconcile_publication_empty_catalog_purges_all(spark, tmp_path):
    pipe, sink, _ = _mk(spark, tmp_path, ["public.a", "public.b"])
    pipe.run_until_drained()
    res = pipe.reconcile_publication(PublicationCatalog("etl", rows=[]))
    assert sorted(res["removed"]) == ["public.a", "public.b"]
    assert pipe.control.tables == {} or not pipe.control.tables
    assert sink.read("public.a").count() == 0


def test_column_list_trim_preserves_parameterized_types():
    """ADVICE r12: the trim must split payload_schema on commas OUTSIDE
    parentheses — a decimal(12,2) column must survive intact, never be
    durably corrupted mid-type."""
    cfg = TableConfig(name="public.t", snapshot_path=None, keys=["pk"],
                      payload_schema="pk long, amt decimal(12,2), b string")
    row = PublicationTableRow("etl", "public", "t",
                              attnames=["pk", "amt"])
    apply_catalog_to_config(cfg, row)
    assert cfg.payload_schema == "pk long, amt decimal(12,2)"


def test_column_list_trim_rejects_unparseable_schema():
    from etl_spark.publication import _split_schema_fields

    assert _split_schema_fields("a int, b decimal(10,2), c string") == [
        "a int", "b decimal(10,2)", "c string"]
    with pytest.raises(ValueError, match="cannot trim payload_schema"):
        _split_schema_fields("a int, (orphan")
    with pytest.raises(ValueError, match="cannot trim payload_schema"):
        _split_schema_fields("justonename, b int")
