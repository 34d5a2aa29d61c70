"""DuckDB warehouse sink: the external-destination shape (SURVEY §2.10).

The reference's warehouse destinations (BigQuery/Snowflake/DuckLake) all
follow the same contract: stage the micro-batch, then let the WAREHOUSE
execute the keyed merge (staging-table MERGE, ducklake/core.rs:1133-1216;
BigQuery CDC upserts, bigquery/core.rs:1409-1478). This sink reproduces
that division of labor with DuckDB as the warehouse:

- Spark writes the batch as parquet (distributed, its job);
- DuckDB ingests the staged files and applies the LWW merge in SQL keyed
  by (replica identity, event_seq), with batch-id replay dedup recorded in
  an ``applied_batches`` table (ducklake/core.rs:74-80).

On a cluster the staging directory is object storage and the DuckDB file
is whatever warehouse you point the same SQL at — the sink's Spark side
never changes.
"""

from __future__ import annotations

import os
import tempfile

import duckdb
from pyspark.sql import DataFrame

from etl_spark.streaming.sinks import Sink


class DuckDBCurrentStateSink(Sink):
    """Current-state (LWW) tables materialized inside a DuckDB database.

    DELIVERY CONTRACT — what the LWW protection spans. A key's
    ``_etl_seq`` lives WITH its row, so it dies with the row's tombstone:
    after a DELETE wins, nothing in the warehouse remembers the key's
    high-water sequence. Protection therefore covers exactly what Spark
    micro-batches deliver — (a) batches arriving in order and (b)
    whole-batch replays of already-applied batches (absorbed by the
    ``applied_batches`` ledger). It does NOT cover arbitrary cross-batch
    reordering: a never-applied batch arriving AFTER a newer batch whose
    tombstone deleted a key would resurrect that key, because the stale
    row's NOT-EXISTS insert sees no surviving row to compare sequences
    against. This is the same stance as the reference's DuckLake
    destination (ducklake/core.rs:1133-1216) and deliberately weaker than
    BigQuery's persisted ``_CHANGE_SEQUENCE_NUMBER``
    (bigquery/core.rs:1391-1407), which survives reordering by keeping
    the sequence in the destination table even through deletes. Spark's
    checkpointed foreachBatch guarantees ordered delivery + whole-batch
    replay, so the stronger contract is unnecessary here; pinned by
    ``tests/test_streaming.py::test_duckdb_sink_delivery_contract``."""

    def __init__(self, db_path: str, keys: dict[str, list[str]], staging_dir: str | None = None):
        self.db_path = db_path
        self.keys = keys  # table -> replica identity columns
        self.staging_dir = staging_dir or tempfile.mkdtemp(prefix="etl_stage_")
        con = self._con()
        con.execute(
            "CREATE TABLE IF NOT EXISTS applied_batches ("
            "  tbl VARCHAR, batch_id BIGINT, PRIMARY KEY (tbl, batch_id))"
        )
        con.close()

    def _con(self):
        return duckdb.connect(self.db_path)

    def _stage(self, table: str, df: DataFrame, tag: str) -> str:
        out = os.path.join(self.staging_dir, table, tag)
        df.write.mode("overwrite").parquet(out)
        return out

    # -- Sink ----------------------------------------------------------------
    def write_snapshot(self, table: str, df: DataFrame, snapshot_lsn: int = 0) -> None:
        staged = self._stage(table, df, "snapshot")
        con = self._con()
        con.execute(f'DROP TABLE IF EXISTS "{table}"')
        con.execute(
            f'CREATE TABLE "{table}" AS '
            f"SELECT *, CAST({snapshot_lsn} AS HUGEINT) AS _etl_seq "
            f"FROM read_parquet('{staged}/*.parquet')"
        )
        con.execute("DELETE FROM applied_batches WHERE tbl = ?", [table])
        con.close()

    def write_changes(self, table: str, df: DataFrame, batch_id: int) -> None:
        con = self._con()
        seen = con.execute(
            "SELECT 1 FROM applied_batches WHERE tbl = ? AND batch_id = ?",
            [table, batch_id],
        ).fetchone()
        if seen:  # replay: already durable in the warehouse
            con.close()
            return
        cols = [c for c in df.columns if c not in ("op", "commit_lsn", "tx_ordinal", "event_seq")]
        staged = self._stage(table, df, f"batch_{batch_id}")
        keys = self.keys[table]
        key_eq = " AND ".join(f't."{k}" = w.{k}' for k in keys)
        col_list = ", ".join(f'"{c}"' for c in cols)
        con.execute("BEGIN")
        # winner per key within the batch (LWW by event_seq), then delete
        # superseded target rows and insert survivors — the staging-merge
        # pattern every reference warehouse destination uses
        con.execute(
            f"CREATE TEMP TABLE w AS "
            f"SELECT * FROM ("
            f"  SELECT *, row_number() OVER ("
            f"    PARTITION BY {', '.join(keys)} ORDER BY CAST(event_seq AS HUGEINT) DESC) AS rn"
            f"  FROM read_parquet('{staged}/*.parquet')) WHERE rn = 1"
        )
        con.execute(f'DELETE FROM "{table}" t USING w WHERE {key_eq} AND CAST(w.event_seq AS HUGEINT) > t._etl_seq')
        con.execute(
            f'INSERT INTO "{table}" SELECT {col_list}, CAST(event_seq AS HUGEINT) FROM w '
            f"WHERE op <> 'DELETE' AND NOT EXISTS ("
            f'  SELECT 1 FROM "{table}" t WHERE {key_eq})'
        )
        con.execute("INSERT INTO applied_batches VALUES (?, ?)", [table, batch_id])
        con.execute("COMMIT")
        con.close()

    def reconcile_keys(self, table: str, keys) -> None:
        self.keys[table] = list(keys)

    def truncate(self, table: str) -> None:
        con = self._con()
        exists = con.execute(
            "SELECT 1 FROM information_schema.tables WHERE table_name = ?", [table]
        ).fetchone()
        if exists:
            con.execute(f'DELETE FROM "{table}"')
        con.execute("DELETE FROM applied_batches WHERE tbl = ?", [table])
        con.close()

    def apply_schema_change(self, table, renames=None, drops=None,
                            defaults=None, nullability=None) -> None:
        """SchemaDiff at a SQL destination (schema.rs:729-784): RENAME,
        DROP, ADD .. DEFAULT and SET/DROP NOT NULL are real ALTER TABLE
        statements, idempotent under batch replay (a rename whose source
        column no longer exists, or a drop of an already-dropped column,
        is skipped; nullability ALTERs are naturally idempotent)."""
        con = self._con()
        exists = con.execute(
            "SELECT 1 FROM information_schema.tables WHERE table_name = ?", [table]
        ).fetchone()
        if not exists:
            con.close()
            return
        cols = {
            r[0]
            for r in con.execute(
                "SELECT column_name FROM information_schema.columns "
                "WHERE table_name = ?", [table],
            ).fetchall()
        }
        for old, new in (renames or []):
            if old in cols and new not in cols:
                con.execute(f'ALTER TABLE "{table}" RENAME COLUMN "{old}" TO "{new}"')
                cols.discard(old)
                cols.add(new)
        for col in (drops or []):
            if col in cols:
                con.execute(f'ALTER TABLE "{table}" DROP COLUMN "{col}"')
                cols.discard(col)
        for col, value, typ in (defaults or []):
            if col not in cols:
                # DDL takes no bind parameters: add the column, then
                # backfill existing rows with a parameterized UPDATE —
                # in ONE transaction. Autocommitted, a crash between the
                # two statements leaves the column added but not
                # backfilled, and the idempotent replay skips it (col
                # already exists), so pre-DDL rows would permanently read
                # NULL instead of the declared default.
                con.execute("BEGIN TRANSACTION")
                try:
                    con.execute(f'ALTER TABLE "{table}" ADD COLUMN "{col}" {typ}')
                    con.execute(
                        f'UPDATE "{table}" SET "{col}" = CAST(? AS {typ})', [value]
                    )
                    con.execute("COMMIT")
                except Exception:
                    con.execute("ROLLBACK")
                    raise
                cols.add(col)
        for col, nullable in (nullability or []):
            if col in cols:
                verb = "DROP NOT NULL" if nullable else "SET NOT NULL"
                con.execute(f'ALTER TABLE "{table}" ALTER COLUMN "{col}" {verb}')
        # key columns follow renames so the staged MERGE keeps matching
        ren = dict(renames or [])
        if table in self.keys:
            self.keys[table] = [ren.get(k, k) for k in self.keys[table]]
        con.close()

    def read(self, table: str):
        """Driver-side read-back (tests): list of dict rows."""
        con = self._con()
        out = con.execute(f'SELECT * FROM "{table}"').df().to_dict("records")
        con.close()
        return out
