"""Session-agnostic testdata readers.

The driver's correctness harness builds its own vanilla ``SparkSession``
— none of the builder configs in :mod:`etl_spark.session` apply there.
The testdata's ``events.parquet`` carries a TIMESTAMP(NANOS) column,
which vanilla Spark rejects with ``PARQUET_TYPE_ILLEGAL`` unless
``spark.sql.legacy.parquet.nanosAsLong`` is set (runtime-settable, so a
``spark.conf.set`` immediately before the read is sufficient and safe).

Every code path that reads the driver's parquet tables goes through
:func:`read_table` so the engine works under ANY session, not just
:func:`etl_spark.session.get_spark`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Runtime confs required to read the driver-generated testdata under a
#: vanilla session. nanosAsLong: events.parquet `ts` is TIMESTAMP(NANOS),
#: exposed as raw int64 nanos — which is what the workload wants anyway
#: (raw-long comparisons keep parquet row-group pruning alive).
_TESTDATA_CONFS = (("spark.sql.legacy.parquet.nanosAsLong", "true"),)


def ensure_testdata_confs(spark: SparkSession) -> None:
    """Set the runtime confs the testdata requires (idempotent)."""
    for key, value in _TESTDATA_CONFS:
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
        except Exception:
            # Conf not recognized by this build — reading will surface
            # the real error; don't mask it here.
            pass


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with testdata confs applied first."""
    ensure_testdata_confs(spark)
    return spark.read.parquet(path)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table (``{sf_dir}/{name}.parquet``)."""
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")
