"""Replica-identity matrix, mirroring crates/etl/tests/pipeline_replica_identity.rs:

- default_replica_identity_with_composite_primary_key_handles_partial_and_key_rows
- full_replica_identity_with_composite_primary_key_preserves_full_old_rows
- using_index_replica_identity_keeps_key_rows_in_table_order
- none_replica_identity_..._rejects_updates_and_deletes

Scenario (same event script as the reference): INSERT → non-identity
UPDATE (city) → TOAST update (large_text unchanged) → identity-changing
UPDATE (surname) → DELETE, against a composite identity (id, surname).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_spark.operators import identity, materialize

IDENT = ["id", "surname"]

SCHEMA = (
    "op string, event_seq long, id long, surname string, name string, "
    "large string, before_id long, before_surname string, "
    "before_name string, before_large string"
)


def _script(spark, full_old_rows: bool):
    """The 5-event reference scenario. ``full_old_rows`` switches the
    old-row shape between KEY-ONLY (default/index identity) and FULL."""
    n = (None, None)  # (before_name, before_large) under key-only identity
    rows = [
        # INSERT: no old row in either mode
        ("INSERT", 1, 1, "S", "A",  "L0", None, None, *n),
        # non-identity UPDATE (name): default → NO old row; full → full old
        ("UPDATE", 2, 1, "S", "A2", "L0",
         *( (1, "S", "A", "L0") if full_old_rows else (None, None, *n) )),
        # TOAST update: new image partial (large=NULL); full mode carries
        # the complete old image including the previous large value
        ("UPDATE", 3, 1, "S", "A2", None,
         *( (1, "S", "A2", "L0") if full_old_rows else (None, None, *n) )),
        # identity-changing UPDATE (surname S→S2): old row present in both
        # modes — key-only vs full
        ("UPDATE", 4, 1, "S2", "A2", "L1",
         *( (1, "S", "A2", "L0") if full_old_rows else (1, "S", *n) )),
        # DELETE: addressed purely via the old image
        ("DELETE", 5, None, None, None, None,
         *( (1, "S2", "A2", "L1") if full_old_rows else (1, "S2", *n) )),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_resolve_identity_structural():
    # USING INDEX resolving to the PK columns IS PrimaryKey (schema.rs doc)
    assert identity.resolve_identity("index", ["id"], ["id"]) == identity.IDENTITY_PRIMARY_KEY
    assert (
        identity.resolve_identity("index", ["id"], ["name", "surname"])
        == identity.IDENTITY_ALTERNATIVE_KEY
    )
    assert identity.resolve_identity("default", ["id"]) == identity.IDENTITY_PRIMARY_KEY
    assert identity.resolve_identity("default", None) == identity.IDENTITY_MISSING
    assert identity.resolve_identity("full", ["id"]) == identity.IDENTITY_FULL
    assert identity.resolve_identity("nothing", ["id"]) == identity.IDENTITY_MISSING
    assert identity.resolve_identity("index", ["id"], None) == identity.IDENTITY_MISSING


def test_identity_columns_table_order():
    # identity rows keep TABLE order (using_index_..._keeps_key_rows_in_table_order)
    cols = identity.identity_columns(
        identity.IDENTITY_ALTERNATIVE_KEY, ["id"], index_cols=["name", "surname"]
    )
    assert cols == ["name", "surname"]
    full = identity.identity_columns(
        identity.IDENTITY_FULL, ["id"], all_cols=["id", "name", "surname", "city"]
    )
    assert full == ["id", "name", "surname", "city"]
    with pytest.raises(identity.IdentityMissingError):
        identity.identity_columns(identity.IDENTITY_MISSING, ["id"])


def test_default_identity_key_only_old_rows(spark):
    """Key-only old rows: delete addresses via the old image; the identity
    change relocates the row; final state after all 5 events is empty."""
    env = _script(spark, full_old_rows=False)

    # through event 4: exactly one row, at the NEW identity (1, S2)
    upto4 = env.filter(F.col("event_seq") <= 4)
    cur = identity.current_state_with_identity(
        upto4, identity.IDENTITY_PRIMARY_KEY, IDENT
    )
    rows = cur.collect()
    assert len(rows) == 1
    assert (rows[0].id, rows[0].surname, rows[0].name) == (1, "S2", "A2")

    # the synthetic delete purged the OLD identity (1, S)
    assert cur.filter(F.col("surname") == "S").count() == 0

    # event 5 (DELETE, old-image-addressed) empties the table
    cur_all = identity.current_state_with_identity(
        env, identity.IDENTITY_PRIMARY_KEY, IDENT
    )
    assert cur_all.count() == 0


def test_full_identity_toast_resolves_from_old_image(spark):
    """REPLICA IDENTITY FULL: the partial (TOAST) update's missing value
    comes from the event's own full old row — no history window needed."""
    env = _script(spark, full_old_rows=True)
    resolved = identity.resolve_toast_from_old_image(env, ["large"])
    e3 = resolved.filter(F.col("event_seq") == 3).collect()[0]
    assert e3.large == "L0"  # filled from before_large

    upto4 = resolved.filter(F.col("event_seq") <= 4)
    cur = identity.current_state_with_identity(
        upto4, identity.IDENTITY_FULL, IDENT
    )
    rows = cur.collect()
    assert len(rows) == 1
    assert (rows[0].surname, rows[0].large) == ("S2", "L1")


def test_alternative_key_identity(spark):
    """USING INDEX on a distinct unique index: same machinery, identity =
    the index columns — here (id, surname) acts as the alt key already,
    so reuse the script with the alt-key type."""
    env = _script(spark, full_old_rows=False)
    cur = identity.current_state_with_identity(
        env.filter(F.col("event_seq") <= 4),
        identity.IDENTITY_ALTERNATIVE_KEY,
        IDENT,
    )
    assert [(r.id, r.surname) for r in cur.collect()] == [(1, "S2")]


def test_missing_identity_rejects_current_state(spark):
    """REPLICA IDENTITY NOTHING: current-state materialization is rejected;
    only INSERTs survive the legality filter; changelog still works."""
    env = _script(spark, full_old_rows=False)
    with pytest.raises(identity.IdentityMissingError):
        identity.current_state_with_identity(env, identity.IDENTITY_MISSING, IDENT)

    legal = identity.reject_unkeyable(env, identity.IDENTITY_MISSING)
    ops = [r.op for r in legal.collect()]
    assert ops == ["INSERT"]  # reference: only the insert lands

    log = materialize.changelog(legal)
    assert log.count() == 1
