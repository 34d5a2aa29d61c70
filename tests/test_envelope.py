from decimal import Decimal

from pyspark.sql import Row

from etl_spark.envelope import (
    GENERIC_ENVELOPE,
    SEQ_SHIFT,
    validate_envelope,
    with_sequence,
)


def make_env(spark, rows):
    return spark.createDataFrame(rows, schema=GENERIC_ENVELOPE)


def test_event_seq_packs_and_orders(spark):
    rows = [
        Row(op="INSERT", table="t", commit_lsn=2, start_lsn=20, tx_ordinal=0,
            after=None, before=None, before_kind=None, missing_cols=None,
            schema_snapshot_lsn=None),
        Row(op="INSERT", table="t", commit_lsn=1, start_lsn=19, tx_ordinal=5,
            after=None, before=None, before_kind=None, missing_cols=None,
            schema_snapshot_lsn=None),
        Row(op="INSERT", table="t", commit_lsn=1, start_lsn=18, tx_ordinal=4,
            after=None, before=None, before_kind=None, missing_cols=None,
            schema_snapshot_lsn=None),
    ]
    df = with_sequence(make_env(spark, rows))
    got = {(r.commit_lsn, r.tx_ordinal): r.event_seq for r in df.collect()}
    # packing mirrors event.rs:341-343: commit_lsn in high 64 bits
    assert got[(1, 4)] == Decimal(1 * SEQ_SHIFT + 4)
    assert got[(1, 5)] == Decimal(1 * SEQ_SHIFT + 5)
    assert got[(2, 0)] == Decimal(2 * SEQ_SHIFT + 0)
    # total order: commit first, ordinal second
    assert got[(1, 5)] < got[(2, 0)]


def test_event_seq_hex_format(spark):
    rows = [
        Row(op="COMMIT", table=None, commit_lsn=255, start_lsn=16, tx_ordinal=0,
            after=None, before=None, before_kind=None, missing_cols=None,
            schema_snapshot_lsn=None),
    ]
    df = with_sequence(make_env(spark, rows))
    # rendering mirrors event.rs:353-375
    assert df.collect()[0].event_seq_hex == "00000000000000ff/0000000000000010"


def test_validate_envelope(spark):
    df = make_env(spark, [])
    assert validate_envelope(df) == []
    assert validate_envelope(df.drop("op")) == ["missing required envelope column: op"]
