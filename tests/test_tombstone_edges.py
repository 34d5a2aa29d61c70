"""Tombstone-edge differential tests: a key whose history interleaves
DELETE between UPDATEs (UPDATE → DELETE → INSERT → UPDATE) — the lag
previous-image diff (cdc_changed_columns) and SCD2 version closing
(cdc_scd2_history) must match the DuckDB oracle on DELETE-adjacent
transitions that the driver's synthetic corpus may under-exercise.

Strategy: write a crafted events.parquet into a tmp sf_dir, then run the
REAL workload query and its REAL oracle SQL side-by-side (the same
compare the gate uses) — the adversarial corpus, not a re-implementation.
"""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.test_oracle_parity import normalize

#: one pk (user 1) traversing INSERT → UPDATE → DELETE → INSERT → UPDATE
#: → UPDATE, a second pk (user 2) for a no-tombstone control, and a pk
#: (user 3) that ENDS on a DELETE (no current version).
_EVENTS = [
    # (event_id, user_id, event_type, value, props)
    (0, 1, "signup", 1.0, '{"k": 1}'),
    (1, 1, "click", 2.0, '{"k": 1}'),      # UPDATE: value changed only
    (2, 1, "error", 2.0, '{"k": 1}'),      # DELETE (tombstone)
    (3, 1, "signup", 2.0, '{"k": 2}'),     # re-INSERT after delete
    (4, 1, "click", 2.0, '{"k": 2}'),      # UPDATE: nothing changed
    (5, 1, "view", 3.0, '{"k": 3}'),       # UPDATE: both changed
    (6, 2, "signup", 9.0, '{"k": 9}'),
    (7, 2, "click", 9.5, '{"k": 9}'),
    (8, 3, "signup", 4.0, '{"k": 4}'),
    (9, 3, "error", 4.0, '{"k": 4}'),      # history ends on the tombstone
]


@pytest.fixture(scope="module")
def tomb_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt

    d = tmp_path_factory.mktemp("tombstone_sf")
    base = dt.datetime(2024, 1, 1)
    tbl = pa.table({
        "event_id": pa.array([e[0] for e in _EVENTS], pa.int64()),
        "ts": pa.array(
            [base + dt.timedelta(minutes=e[0]) for e in _EVENTS],
            pa.timestamp("us"),
        ),
        "user_id": pa.array([e[1] for e in _EVENTS], pa.int64()),
        "event_type": pa.array([e[2] for e in _EVENTS], pa.string()),
        "value": pa.array([e[3] for e in _EVENTS], pa.float64()),
        "props": pa.array([e[4] for e in _EVENTS], pa.string()),
    })
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def _both(spark, tomb_dir, name):
    q = entrymod.queries()[name]
    sdf = q(spark, tomb_dir).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{tomb_dir}/events.parquet'")
    odf = con.sql(entrymod.oracle_sql()[name]).df()
    con.close()
    assert sorted(sdf.columns) == sorted(odf.columns), (sdf.columns, odf.columns)
    got = normalize(sdf.to_dict("records"), list(sdf.columns))
    want = normalize(odf.to_dict("records"), list(odf.columns))
    return got, want, sdf


def test_changed_columns_tombstone_interleaved(spark, tomb_dir):
    got, want, sdf = _both(spark, tomb_dir, "cdc_changed_columns")
    assert got == want
    by_lsn = {int(r["start_lsn"]): r for r in sdf.to_dict("records")}
    # the UPDATE right after the re-INSERT diffs against the INSERT image
    # (nothing changed), never against the pre-delete image
    assert by_lsn[4]["n_changed"] == 0
    # the later UPDATE sees both columns changed
    assert by_lsn[5]["n_changed"] == 2
    assert by_lsn[1]["value_changed"] and not by_lsn[1]["props_changed"]


def test_scd2_history_tombstone_interleaved(spark, tomb_dir):
    got, want, sdf = _both(spark, tomb_dir, "cdc_scd2_history")
    assert got == want
    rows = sdf.to_dict("records")
    u1 = sorted((r for r in rows if r["pk"] == 1), key=lambda r: r["valid_from"])
    # DELETE emits no version row but CLOSES the prior version
    assert [r["op"] for r in u1] == ["INSERT", "UPDATE", "INSERT", "UPDATE", "UPDATE"]
    pre_delete_update = u1[1]
    assert pre_delete_update["valid_to"] is not None  # closed by the DELETE
    assert not pre_delete_update["is_current"]
    # exactly one current version, the last UPDATE after the re-insert
    currents = [r for r in u1 if r["is_current"]]
    assert len(currents) == 1 and currents[0]["value"] == 3.0
    # a key whose history ends on DELETE has NO current version
    u3 = [r for r in rows if r["pk"] == 3]
    assert u3 and not any(r["is_current"] for r in u3)
