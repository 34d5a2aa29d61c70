"""Input-schema contract: the engine accepts every ``ts`` flavor the
driver has ever shipped.

Round 3 regression postmortem: the driver regenerated ``events.parquet``
with ``ts: timestamp[us]`` (was TIMESTAMP(NANOS)) and the engine — which
hard-assumed int64-nanos at ~17 sites — lost 10 gate queries, 15 tests
and the bench to one silent schema drift.  The reference never assumes
wire types (crates/etl/src/postgres/codec/text.rs:33-150 dispatches on
the declared type); this test is the Spark-side equivalent of that
guarantee, pinned at the :func:`etl_spark.io.read_table` choke point.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_spark.io import normalize_ts_nanos, read_table

EPOCH = datetime.timezone.utc
TS_VALUES = [
    datetime.datetime(2024, 1, 1, 0, 0, 1, 500000),
    datetime.datetime(2024, 1, 1, 12, 34, 56, 789012),
    datetime.datetime(2024, 6, 30, 23, 59, 59, 999999),
]
EXPECTED_NANOS = [
    int(t.replace(tzinfo=EPOCH).timestamp() * 1_000_000) * 1_000 for t in TS_VALUES
]


def _write_events(tmpdir: str, ts_array: pa.Array) -> str:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["click", "view", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    path = f"{tmpdir}/events.parquet"
    pq.write_table(table, path)
    return tmpdir


FLAVORS = {
    "micros": pa.array(TS_VALUES, pa.timestamp("us")),
    "nanos": pa.array(
        [v for v in EXPECTED_NANOS], pa.timestamp("ns")
    ),
    "millis": pa.array(TS_VALUES, pa.timestamp("ms")),
    "raw_int64_nanos": pa.array(EXPECTED_NANOS, pa.int64()),
}


@pytest.mark.parametrize("flavor", sorted(FLAVORS))
def test_read_table_normalizes_every_ts_flavor(spark, tmp_path, flavor):
    sf_dir = _write_events(str(tmp_path), FLAVORS[flavor])
    df = read_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "bigint"
    got = {r.event_id: r.ts for r in df.collect()}
    expected = dict(zip([1, 2, 3], EXPECTED_NANOS))
    if flavor == "millis":
        # millis parquet truncates sub-ms precision; compare at ms grain
        got = {k: v // 1_000_000 for k, v in got.items()}
        expected = {k: v // 1_000_000 for k, v in expected.items()}
    assert got == expected


def test_real_testdata_reads_as_bigint(spark, sf_dir):
    df = read_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "bigint"
    assert df.limit(1).count() == 1


def test_normalize_rejects_non_temporal(spark):
    df = spark.createDataFrame([("a",)], ["ts"])
    with pytest.raises(TypeError, match="unsupported type"):
        normalize_ts_nanos(df)


def test_normalize_passthrough_without_ts(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    assert normalize_ts_nanos(df) is df


def test_contract_clean_on_shipped_testdata(spark):
    """The shipped testdata conforms — no drift warnings."""
    from etl_spark.io import check_contract

    for name in ("events", "documents", "embeddings"):
        df = read_table(spark, "/root/testdata/sf0.001", name)
        assert check_contract(df, name) == []


def test_contract_flags_drift(spark, tmp_path):
    """A regenerated table whose column leaves its type family produces a
    pointed drift message naming table, column, and offending type."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_spark.io import check_contract

    table = pa.table(
        {
            "doc_id": pa.array(["1", "2"]),        # int family -> string
            "text": pa.array(["a", "b"]),
            "lang": pa.array(["en", "en"]),
            "n_chars": pa.array([1, 1], pa.int64()),  # 'source' missing
        }
    )
    pq.write_table(table, f"{tmp_path}/documents.parquet")
    df = spark.read.parquet(f"{tmp_path}/documents.parquet")
    drift = check_contract(df, "documents")
    assert any("doc_id" in d and "string" in d for d in drift)
    assert any("source" in d and "MISSING" in d for d in drift)


DATE_VALUES = [
    datetime.date(1995, 3, 15),
    datetime.date(1996, 7, 1),
    datetime.date(1998, 12, 1),
]
DATE_NANOS = [
    int(datetime.datetime(d.year, d.month, d.day, tzinfo=EPOCH).timestamp())
    * 1_000_000_000
    for d in DATE_VALUES
]

DATE_FLAVORS = {
    "date32": pa.array(DATE_VALUES, pa.date32()),
    "micros": pa.array(
        [datetime.datetime(d.year, d.month, d.day) for d in DATE_VALUES],
        pa.timestamp("us"),
    ),
    "nanos": pa.array(DATE_NANOS, pa.timestamp("ns")),
}


@pytest.mark.parametrize("flavor", sorted(DATE_FLAVORS))
def test_read_table_normalizes_orderdate_flavors(spark, tmp_path, flavor):
    """o_orderdate arrives as TIMESTAMP_NTZ whatever the parquet carried —
    DATE, timestamp[us], or TIMESTAMP(NANOS) (which the global nanosAsLong
    conf would otherwise silently turn into a raw long, the r3 failure
    shape on a different column)."""
    table = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_orderdate": DATE_FLAVORS[flavor],
        }
    )
    pq.write_table(table, f"{tmp_path}/orders.parquet")
    df = read_table(spark, str(tmp_path), "orders")
    assert dict(df.dtypes)["o_orderdate"] == "timestamp_ntz"
    got = {r.o_orderkey: r.o_orderdate for r in df.collect()}
    expected = dict(
        zip([1, 2, 3], [datetime.datetime(d.year, d.month, d.day) for d in DATE_VALUES])
    )
    assert got == expected


def test_real_testdata_dates_are_ntz(spark, sf_dir):
    for name, col in (("lineitem", "l_shipdate"), ("orders", "o_orderdate")):
        df = read_table(spark, sf_dir, name)
        assert dict(df.dtypes)[col] == "timestamp_ntz"
