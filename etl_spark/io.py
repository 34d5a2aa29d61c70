"""Session-agnostic testdata readers.

The driver's correctness harness builds its own vanilla ``SparkSession``
— none of the builder configs in :mod:`etl_spark.session` apply there.
Every code path that reads the driver's parquet tables goes through
:func:`read_table` so the engine works under ANY session, not just
:func:`etl_spark.session.get_spark`.

Input-type contract for ``events.ts``
-------------------------------------
The driver has shipped ``events.parquet`` with ``ts`` as both
TIMESTAMP(NANOS) (rounds 1–2, read as int64 nanos via ``nanosAsLong``)
and plain ``timestamp[us]`` (round 3+, read as TIMESTAMP_NTZ).  The
engine's internal contract is **epoch-nanoseconds as BIGINT** — the same
value DuckDB's ``epoch_ns(ts)`` yields, so the oracles are unaffected by
which flavor the parquet carries.  :func:`read_table` normalizes at this
single choke point; nothing downstream needs a type check.  This mirrors
the reference's typed decode dispatch (crates/etl/src/postgres/codec/
text.rs:33-150): wire types are resolved once at ingest, never assumed.

Scale note: deriving ``ts`` blocks parquet row-group pruning for
time-range filters on the derived long.  At 100 TB the events table
would be date-partitioned (see SCALE.md) and partition pruning — which
operates on directory values, not column stats — still applies; the
per-file derivation itself is a codegen-stage projection with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Runtime confs required to read the driver-generated testdata under a
#: vanilla session. nanosAsLong: when events.parquet `ts` is
#: TIMESTAMP(NANOS), expose it as raw int64 nanos (the engine contract).
#: Harmless no-op when the parquet carries micros.
_TESTDATA_CONFS = (("spark.sql.legacy.parquet.nanosAsLong", "true"),)

#: Epoch expressed as a timezone-free literal: `timestampdiff` against it
#: converts TIMESTAMP_NTZ to epoch micros with no session-timezone
#: dependence, matching DuckDB `epoch_ns(ts) // 1000` exactly.
_EPOCH_NANOS_EXPR = (
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
    "cast({col} as timestamp_ntz)) * CAST(1000 AS BIGINT)"
)


def normalize_ts_nanos(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a timestamp-or-long column to epoch-nanos BIGINT.

    Accepts the column already being a long (TIMESTAMP(NANOS) parquet
    read under ``nanosAsLong``) — returned unchanged — or any
    timestamp/timestamp_ntz flavor, converted timezone-free.  Columns of
    any other type (or absent) raise: silent schema drift is exactly the
    failure mode this guard exists to prevent.
    """
    field = next((f for f in df.schema.fields if f.name == col), None)
    if field is None:
        return df
    if isinstance(field.dataType, (T.LongType, T.IntegerType)):
        return df
    if isinstance(field.dataType, (T.TimestampType, T.TimestampNTZType)):
        return df.withColumn(col, F.expr(_EPOCH_NANOS_EXPR.format(col=col)))
    raise TypeError(
        f"column {col!r} has unsupported type {field.dataType.simpleString()}; "
        "expected bigint (epoch nanos) or timestamp"
    )


#: Expected column → type-family contract per testdata table. Families are
#: deliberately coarse (any int width, any decimal scale, double-or-float)
#: — the engine tolerates those drifts; the check exists so the NEXT
#: testdata regeneration that moves a column outside its family produces
#: ONE pointed warning at the read choke point instead of ten
#: AnalysisExceptions deep inside query plans (the r3 postmortem).
_FAMILIES = {
    "int": (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
    "float": (T.DoubleType, T.FloatType, T.DecimalType),
    "string": (T.StringType,),
    "array": (T.ArrayType,),
    # ts is normalized separately; listed so absence still warns
    "ts": (T.LongType, T.TimestampType, T.TimestampNTZType),
    # date-ish columns normalized separately (normalize_datetime_ntz)
    "datetime": (T.LongType, T.DateType, T.TimestampType, T.TimestampNTZType),
}
_CONTRACT = {
    "events": {"event_id": "int", "ts": "ts", "user_id": "int",
               "event_type": "string", "value": "float", "props": "string"},
    "documents": {"doc_id": "int", "text": "string", "lang": "string",
                  "source": "string", "n_chars": "int"},
    "embeddings": {"vec_id": "int", "embedding": "array", "label": "int"},
    "lineitem": {"l_orderkey": "int", "l_shipdate": "datetime"},
    "orders": {"o_orderkey": "int", "o_orderdate": "datetime"},
}

#: date-ish columns normalized to TIMESTAMP_NTZ at the read choke point —
#: the engine contract every relational query compares `_ts()` literals
#: against. Accepts DATE, TIMESTAMP, TIMESTAMP_NTZ, or (TIMESTAMP(NANOS)
#: parquet under the global nanosAsLong conf) epoch-nanos longs; the long
#: path converts with pure NTZ arithmetic so no session timezone applies.
_DATETIME_COLS = {
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
}


def normalize_datetime_ntz(df: DataFrame, col: str) -> DataFrame:
    """Normalize a date-or-timestamp-or-nanos-long column to TIMESTAMP_NTZ."""
    field = next((f for f in df.schema.fields if f.name == col), None)
    if field is None:
        return df
    if isinstance(field.dataType, T.TimestampNTZType):
        return df
    if isinstance(field.dataType, (T.DateType, T.TimestampType)):
        return df.withColumn(col, F.col(col).cast("timestamp_ntz"))
    if isinstance(field.dataType, T.LongType):
        return df.withColumn(
            col,
            F.expr(
                f"timestampadd(MICROSECOND, CAST({col} div 1000 AS BIGINT), "
                "TIMESTAMP_NTZ'1970-01-01 00:00:00')"
            ),
        )
    raise TypeError(
        f"column {col!r} has unsupported type {field.dataType.simpleString()}; "
        "expected date/timestamp/timestamp_ntz or bigint (epoch nanos)"
    )


def check_contract(df: DataFrame, name: str) -> list[str]:
    """Return human-readable drift messages for ``df`` vs the table's
    expected column/type-family contract (empty = conforming)."""
    expected = _CONTRACT.get(name)
    if not expected:
        return []
    fields = {f.name: f.dataType for f in df.schema.fields}
    drift = []
    for col, fam in expected.items():
        if col not in fields:
            drift.append(f"{name}.{col}: MISSING (expected {fam} family)")
        elif not isinstance(fields[col], _FAMILIES[fam]):
            drift.append(
                f"{name}.{col}: {fields[col].simpleString()} outside the "
                f"{fam} family"
            )
    return drift


_warned_tables: set[str] = set()


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


#: inferred-schema memo: (path, mtime_ns, size) -> StructType. Creating a
#: parquet DataFrame WITHOUT a schema eagerly lists + reads footers for
#: inference — ~80-120 ms of driver time per read_table call, paid again
#: on every rep of every query (a bench suite re-reads each table
#: hundreds of times). The key carries mtime+size so an overwritten file
#: re-infers; a StructType is session-independent, so the memo survives
#: session churn. Metadata-only: no row ever caches here.
_schema_cache: dict[tuple[str, int, int], object] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table (``{sf_dir}/{name}.parquet``).

    ``events.ts`` is normalized to the engine's epoch-nanos BIGINT
    contract regardless of the parquet's physical timestamp flavor
    (see module docstring).
    """
    import os

    path = f"{sf_dir}/{name}.parquet"
    key = None
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        pass  # let the Spark reader surface the real error
    schema = _schema_cache.get(key) if key is not None else None
    if schema is not None:
        ensure_testdata_confs(spark)
        df = spark.read.schema(schema).parquet(path)
    else:
        df = read_parquet(spark, path)
        if key is not None:
            _schema_cache[key] = df.schema
    drift = check_contract(df, name)
    if drift and name not in _warned_tables:
        import warnings

        _warned_tables.add(name)
        warnings.warn(
            "testdata schema drift (queries touching these columns may "
            "fail): " + "; ".join(drift),
            stacklevel=2,
        )
    if name == "events":
        df = normalize_ts_nanos(df, "ts")
    for col in _DATETIME_COLS.get(name, ()):
        df = normalize_datetime_ntz(df, col)
    return df
