"""Codec tests mirroring the reference's value-roundtrip strategy
(crates/etl/tests/value_roundtrip.rs): Postgres-rendered text in, typed
values out, with the documented reject rules pinned."""

import datetime

import pytest
from pyspark.sql import functions as F

from etl_spark import codec


def decode(spark, expr_fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    return [r.y for r in df.select(expr_fn(F.col("x")).alias("y")).collect()]


def test_bool(spark):
    assert decode(spark, codec.pg_bool, ["t", "f", "x", None]) == [True, False, None, None]


def test_ints(spark):
    assert decode(spark, codec.pg_int2, ["32767", "-32768"]) == [32767, -32768]
    assert decode(spark, codec.pg_int8, ["9223372036854775807"]) == [9223372036854775807]
    # oid is u32 → long (no unsigned in Spark)
    assert decode(spark, codec.pg_oid, ["4294967295"]) == [4294967295]


def test_floats_specials(spark):
    got = decode(spark, codec.pg_float8, ["1.5", "NaN", "Infinity", "-Infinity"])
    assert got[0] == 1.5
    assert got[1] != got[1]  # NaN
    assert got[2] == float("inf") and got[3] == float("-inf")


def test_numeric_struct(spark):
    got = decode(spark, codec.pg_numeric, ["12.345", "NaN", "+Infinity", "-Infinity"])
    assert str(got[0].value) == "12.345000000" and got[0].special is None
    # canonical reference spellings (numeric.rs Display)
    assert got[1].special == "NaN" and got[1].value is None
    assert got[2].special == "Infinity"
    assert got[3].special == "-Infinity"
    # lossless text side-channel for out-of-range values
    assert got[1].text == "NaN"
    # overflow beyond DECIMAL(38,9): value NULL, text preserved (try_cast)
    over = decode(spark, codec.pg_numeric, ["1" * 40])
    assert over[0].value is None and over[0].text == "1" * 40


def test_bytea_hex(spark):
    got = decode(spark, codec.pg_bytea, ["\\xdeadbeef", "\\x", "nope"])
    assert got[0] == bytearray(b"\xde\xad\xbe\xef")
    assert bytes(got[1]) == b""
    assert got[2] is None


def test_date_rejects(spark):
    got = decode(spark, codec.pg_date, ["2024-02-29", "0001-01-01", "infinity", "2000-01-01 BC"])
    assert got[0] == datetime.date(2024, 2, 29)
    assert got[1] == datetime.date(1, 1, 1)
    assert got[2] is None and got[3] is None  # value_roundtrip.rs:14-18


def test_time_micros(spark):
    got = decode(spark, codec.pg_time, ["00:00:00", "23:59:59.999999", "24:00:00"])
    assert got[0] == 0
    assert got[1] == 86_399_999_999
    assert got[2] is None  # 24:00:00 rejected


def test_timetz(spark):
    got = decode(spark, codec.pg_timetz, ["12:00:00+05:30", "01:02:03.5-08"])
    assert got[0].micros == 12 * 3600 * 1_000_000
    assert got[0].offset_secs == 5 * 3600 + 30 * 60
    assert got[1].offset_secs == -8 * 3600
    assert got[1].micros == (1 * 3600 + 2 * 60 + 3) * 1_000_000 + 500_000


def test_timestamps(spark):
    got = decode(spark, codec.pg_timestamp, ["2024-01-02 03:04:05.123456", "infinity"])
    assert got[0] == datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)
    assert got[1] is None


def test_uuid(spark):
    got = decode(spark, codec.pg_uuid, ["A0EEBC99-9C0B-4EF8-BB6D-6BB9BD380A11", "junk"])
    assert got[0] == "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11"
    assert got[1] is None


def test_json_get(spark):
    df = spark.createDataFrame([('{"k": 7}',)], ["x"])
    assert df.select(codec.json_get("x", "$.k").alias("y")).collect()[0].y == "7"


def test_array_simple(spark):
    got = decode(spark, lambda c: codec.pg_array_simple(c, "int4"),
                 ["{1,2,NULL}", "[0:1]={7,8}", "{}", "{{1},{2}}", "junk"])
    assert got[0] == [1, 2, None]
    assert got[1] == [7, 8]
    assert got[2] == []
    assert got[3] is None  # multidim rejected, not corrupted
    assert got[4] is None


def test_array_full_quoted(spark):
    got = decode(spark, lambda c: codec.pg_array_full(c, "text"),
                 ['{"a,b","c\\"d",NULL,plain}', "{{nested}}"])
    assert got[0] == ["a,b", 'c"d', None, "plain"]
    assert got[1] is None


@pytest.mark.parametrize(
    "lit,expected",
    [
        ("{1,2}", ["1", "2"]),
        ('{"x\\\\y"}', ["x\\y"]),
        ("[0:2]={a,b,c}", ["a", "b", "c"]),
        ("{NULL}", [None]),
        ("{}", []),
        ("{{1}}", None),
        ("nope", None),
    ],
)
def test_array_literal_python(lit, expected):
    assert codec._parse_pg_array_literal(lit) == expected


def test_copy_text_split(spark):
    df = spark.createDataFrame([("a\t\\N\t1",), ("short",)], ["x"])
    got = [r.y for r in df.select(codec.copy_text_split("x", 3).alias("y")).collect()]
    assert got[0] == ["a", None, "1"]
    assert got[1] is None


def test_copy_unescape_order(spark):
    r"""\\ must neutralize BEFORE \t: input '\\t' is literal backslash+t,
    not an escaped tab (ADVICE: single-pass unescape semantics)."""
    cases = [
        (r"\t", "\t"),          # escaped tab
        (r"\\t", "\\t"),        # escaped backslash, then literal t
        (r"\\\t", "\\\t"),      # escaped backslash, then escaped tab
        (r"\\\\", "\\\\"),      # two escaped backslashes
        (r"a\nb", "a\nb"),      # escaped newline
        (r"\r\b\f\v", "\r\b\f\v"),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], ["x"])
    got = [r.y for r in df.select(codec.copy_text_split("x", 1).alias("y")).collect()]
    for (src, want), out in zip(cases, got):
        assert out[0] == want, (src, want, out[0])


def test_copy_encode_decode_roundtrip(spark):
    """decode(encode(cells)) == cells for payloads containing every escape
    target, NULLs, and the literal two-char sequence backslash-N."""
    rows = [
        ("tab\there", None, "line\nbreak"),
        ("back\\slash", "\\N", "both\t\\and\n"),
        ("", "plain", "\r\t\\"),
    ]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    from pyspark.sql import functions as F

    line = codec.copy_text_encode([F.col("a"), F.col("b"), F.col("c")])
    back = df.select(codec.copy_text_split(line, 3).alias("cells")).collect()
    for (a, b, c), r in zip(rows, back):
        assert r.cells == [a, b, c]
