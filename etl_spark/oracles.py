"""DuckDB oracle SQL twins for every entry in ``workload*.py``.

Kept beside the Spark implementations so each pair evolves together. The
driver registers the parquet tables as views named ``region nation customer
supplier part orders lineitem events documents embeddings`` and runs these
verbatim at sf=0.01, comparing row counts, schemas, and order-insensitive
value hashes against the Spark results.

Shared sim-derivation fragment: the CDC envelope from ``events`` —
MUST stay in lockstep with :func:`etl_spark.sources.cdc.envelope_from_events`.
"""

ENVELOPE_CTE = """
env AS (
  SELECT CASE event_type WHEN 'signup' THEN 'INSERT'
                         WHEN 'error' THEN 'DELETE'
                         ELSE 'UPDATE' END AS op,
         'public.users' AS "table",
         CAST(event_id // 10 AS BIGINT) AS commit_lsn,
         CAST(event_id AS BIGINT) AS start_lsn,
         CAST(event_id % 10 AS BIGINT) AS tx_ordinal,
         user_id AS pk,
         value,
         props,
         ts
  FROM events
)
"""

ORACLES: dict[str, str] = {}

ORACLES["cdc_current_state"] = f"""
WITH {ENVELOPE_CTE},
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY pk ORDER BY commit_lsn DESC, tx_ordinal DESC) AS rn
  FROM env
)
SELECT pk, op, commit_lsn, tx_ordinal, value, props
FROM ranked WHERE rn = 1 AND op <> 'DELETE'
"""

ORACLES["cdc_changelog"] = f"""
WITH {ENVELOPE_CTE}
SELECT start_lsn, "table", op AS cdc_operation,
       CAST(CAST(commit_lsn AS DECIMAL(38,0)) * 18446744073709551616 + tx_ordinal AS VARCHAR) AS seq_dec,
       printf('%016x/%016x', commit_lsn, start_lsn) AS seq_hex
FROM env
"""

ORACLES["cdc_tx_metrics"] = f"""
WITH {ENVELOPE_CTE}
SELECT commit_lsn,
       count(*) AS n_events,
       CAST(sum(CASE WHEN op = 'INSERT' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserts,
       CAST(sum(CASE WHEN op = 'DELETE' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
       min(tx_ordinal) AS first_ordinal,
       max(tx_ordinal) AS last_ordinal
FROM env GROUP BY commit_lsn
"""

ORACLES["cdc_toast_lww"] = f"""
WITH {ENVELOPE_CTE},
masked AS (
  SELECT op, pk, commit_lsn, tx_ordinal, start_lsn,
         CASE WHEN op = 'UPDATE' AND start_lsn % 3 = 0 THEN NULL ELSE value END AS value
  FROM env
),
resolved AS (
  SELECT op, pk, commit_lsn, tx_ordinal, start_lsn,
         last_value(value IGNORE NULLS) OVER (
           PARTITION BY pk ORDER BY commit_lsn, tx_ordinal
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
  FROM masked
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY pk ORDER BY commit_lsn DESC, tx_ordinal DESC) AS rn
  FROM resolved
)
SELECT pk, op, start_lsn, value FROM ranked WHERE rn = 1 AND op <> 'DELETE'
"""

ORACLES["cdc_snapshot_handoff"] = f"""
WITH {ENVELOPE_CTE},
snap AS (
  SELECT c_custkey, c_acctbal AS acctbal,
         CAST(0 AS BIGINT) AS commit_lsn, CAST(0 AS BIGINT) AS tx_ordinal,
         'INSERT' AS op
  FROM customer
),
updates AS (
  SELECT pk + 1 AS c_custkey, value AS acctbal, commit_lsn, tx_ordinal, op
  FROM env
  WHERE op = 'UPDATE' AND pk + 1 IN (SELECT c_custkey FROM customer)
),
merged AS (
  SELECT * FROM snap UNION ALL SELECT * FROM updates
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY commit_lsn DESC, tx_ordinal DESC) AS rn
  FROM merged
)
SELECT c_custkey, acctbal, commit_lsn, tx_ordinal
FROM ranked WHERE rn = 1 AND op <> 'DELETE'
"""

ORACLES["cdc_schema_asof"] = f"""
WITH {ENVELOPE_CTE},
registry AS (
  SELECT n_nationkey * 100 AS snapshot_lsn, n_name AS schema_version FROM nation
)
SELECT e.start_lsn, e.commit_lsn,
       (SELECT CAST(max(r.snapshot_lsn) AS BIGINT) FROM registry r WHERE r.snapshot_lsn <= e.commit_lsn) AS snapshot_lsn,
       (SELECT r.schema_version FROM registry r WHERE r.snapshot_lsn <= e.commit_lsn
        ORDER BY r.snapshot_lsn DESC LIMIT 1) AS schema_version
FROM env e
"""

ORACLES["cdc_truncate_reset"] = f"""
WITH {ENVELOPE_CTE},
env2 AS (
  SELECT CASE WHEN start_lsn % 500 = 250 THEN 'TRUNCATE' ELSE op END AS op,
         "table", commit_lsn, start_lsn, tx_ordinal, pk, value
  FROM env
),
trunc AS (
  SELECT "table" AS t_table,
         max(CAST(commit_lsn AS DECIMAL(38,0)) * 18446744073709551616 + tx_ordinal) AS trunc_seq
  FROM env2 WHERE op = 'TRUNCATE' GROUP BY "table"
),
alive AS (
  SELECT e.* FROM env2 e LEFT JOIN trunc t ON e."table" = t.t_table
  WHERE t.trunc_seq IS NULL
     OR CAST(e.commit_lsn AS DECIMAL(38,0)) * 18446744073709551616 + e.tx_ordinal > t.trunc_seq
     OR e.op IN ('TRUNCATE', 'RELATION', 'BEGIN', 'COMMIT')
),
rows_only AS (
  SELECT * FROM alive WHERE op IN ('INSERT', 'UPDATE', 'DELETE')
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY pk ORDER BY commit_lsn DESC, tx_ordinal DESC) AS rn
  FROM rows_only
)
SELECT pk, op, start_lsn, value FROM ranked WHERE rn = 1 AND op <> 'DELETE'
"""

ORACLES["cdc_pk_change"] = f"""
WITH {ENVELOPE_CTE},
env2 AS (
  SELECT *, CASE WHEN op = 'UPDATE' AND start_lsn % 7 = 0 THEN pk - 1 ELSE pk END AS before_pk
  FROM env
),
expanded AS (
  SELECT CASE WHEN v.variant = 0 THEN e.before_pk ELSE e.pk END AS pk,
         CASE WHEN v.variant = 0 THEN 'DELETE' ELSE e.op END AS op,
         e.start_lsn, e.commit_lsn, e.tx_ordinal, e.value,
         v.variant AS sub_ordinal
  FROM env2 e
  CROSS JOIN (SELECT 0 AS variant UNION ALL SELECT 1) v
  WHERE v.variant = 1
     OR (e.op = 'UPDATE' AND e.before_pk IS NOT NULL AND e.before_pk <> e.pk)
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY pk ORDER BY commit_lsn DESC, tx_ordinal DESC, sub_ordinal DESC) AS rn
  FROM expanded
)
SELECT pk, op, start_lsn, sub_ordinal, value FROM ranked WHERE rn = 1 AND op <> 'DELETE'
"""
