"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (CDC current-state
materialization) at sf0.001; ``queries()`` maps every implemented operator
to a (spark, sf_dir) callable; ``oracle_sql()`` gives each one's DuckDB
twin. See SURVEY.md §2 for the operator inventory and
``etl_spark/workload.py`` for implementations.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_spark import workload
from etl_spark.oracles import ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LWW current-state materialization of the sim CDC stream."""
    return workload.cdc_current_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_current_state": workload.cdc_current_state,
        "cdc_changelog": workload.cdc_changelog,
        "cdc_tx_metrics": workload.cdc_tx_metrics,
        "cdc_toast_lww": workload.cdc_toast_lww,
        "cdc_snapshot_handoff": workload.cdc_snapshot_handoff,
        "cdc_schema_asof": workload.cdc_schema_asof,
        "cdc_truncate_reset": workload.cdc_truncate_reset,
        "cdc_pk_change": workload.cdc_pk_change,
    }


def oracle_sql() -> dict[str, str]:
    return {name: ORACLES[name] for name in queries() if name in ORACLES}
