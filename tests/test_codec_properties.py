"""Property-based codec round-trips (reference test layer 3, SURVEY §5).

The reference generates typed values with proptest, renders them to wire
text via Postgres itself, and decodes with the production codec
(crates/etl/tests/value_roundtrip.rs:1-18). Here hypothesis generates the
values, the test renders them the way Postgres renders its text protocol,
and the production Spark codec must recover them exactly — with the same
documented reject rules (reject-not-corrupt, value_roundtrip.rs:14-18).

Each hypothesis example carries a BATCH of values through one Spark job so
shrinkage still works but job-launch overhead doesn't dominate.
"""

from __future__ import annotations

import datetime
import re
import uuid as uuidlib
from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_spark import codec

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def decode(spark, texts, fn, out="v"):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    return [r[out] for r in df.select(fn(F.col("t")).alias(out)).collect()]


# ---------------------------------------------------------------------------
# integers / floats (text.rs:40-59)
# ---------------------------------------------------------------------------

@settings(**SETTINGS)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=30))
def test_int8_roundtrip(spark, values):
    assert decode(spark, [str(v) for v in values], codec.pg_int8) == values


@settings(**SETTINGS)
@given(st.lists(st.integers(min_value=-(2**15), max_value=2**15 - 1), min_size=1, max_size=30))
def test_int2_roundtrip(spark, values):
    assert decode(spark, [str(v) for v in values], codec.pg_int2) == values


def render_pg_float(v: float) -> str:
    if v != v:
        return "NaN"
    if v == float("inf"):
        return "Infinity"
    if v == float("-inf"):
        return "-Infinity"
    return repr(v)  # shortest round-trip form, like PG extra_float_digits=1


@settings(**SETTINGS)
@given(st.lists(st.floats(allow_subnormal=False), min_size=1, max_size=30))
def test_float8_roundtrip(spark, values):
    got = decode(spark, [render_pg_float(v) for v in values], codec.pg_float8)
    for g, v in zip(got, values):
        assert (g != g and v != v) or g == v


# ---------------------------------------------------------------------------
# numeric (numeric.rs; struct{value, special, text} contract)
# ---------------------------------------------------------------------------

@settings(**SETTINGS)
@given(
    st.lists(
        st.decimals(
            allow_nan=False, allow_infinity=False, places=6,
            min_value=Decimal("-1e20"), max_value=Decimal("1e20"),
        ),
        min_size=1, max_size=30,
    )
)
def test_numeric_value_roundtrip(spark, values):
    import decimal

    texts = [str(v) for v in values]
    rows = decode(spark, texts, codec.pg_numeric, out="v")
    with decimal.localcontext() as ctx:
        ctx.prec = 50  # quantize at DECIMAL(38,9) width needs > default 28
        for r, v, t in zip(rows, values, texts):
            assert r["special"] is None
            assert r["text"] == t  # lossless side-channel
            assert r["value"] == v.quantize(Decimal("1.000000000"))


@settings(**SETTINGS)
@given(st.lists(st.sampled_from(["NaN", "Infinity", "-Infinity", "+Infinity", "nan", "infinity"]), min_size=1, max_size=10))
def test_numeric_specials(spark, values):
    canon = {"NAN": "NaN", "INFINITY": "Infinity", "-INFINITY": "-Infinity"}
    rows = decode(spark, values, codec.pg_numeric, out="v")
    for r, t in zip(rows, values):
        assert r["value"] is None
        # canonical reference spellings regardless of input case/sign
        assert r["special"] == canon[t.upper().lstrip("+")]
        assert r["text"] == t


# ---------------------------------------------------------------------------
# bytea (codec/hex.rs)
# ---------------------------------------------------------------------------

@settings(**SETTINGS)
@given(st.lists(st.binary(max_size=64), min_size=1, max_size=30))
def test_bytea_roundtrip(spark, values):
    texts = ["\\x" + v.hex() for v in values]
    got = decode(spark, texts, codec.pg_bytea)
    assert [bytes(g) for g in got] == values


# ---------------------------------------------------------------------------
# temporal (codec/time.rs; rejects per value_roundtrip.rs:14-18)
# ---------------------------------------------------------------------------

@settings(**SETTINGS)
@given(st.lists(st.dates(), min_size=1, max_size=30))
def test_date_roundtrip(spark, values):
    got = decode(spark, [v.isoformat() for v in values], codec.pg_date)
    assert got == values


def test_date_rejects(spark):
    bad = ["infinity", "-infinity", "0001-01-01 BC", "10000-01-01"]
    assert decode(spark, bad, codec.pg_date) == [None] * len(bad)


@settings(**SETTINGS)
@given(st.lists(st.times(), min_size=1, max_size=30))
def test_time_roundtrip(spark, values):
    texts = [v.strftime("%H:%M:%S.%f") for v in values]
    got = decode(spark, texts, codec.pg_time)
    want = [(v.hour * 3600 + v.minute * 60 + v.second) * 1_000_000 + v.microsecond for v in values]
    assert got == want


def test_time_rejects_2400(spark):
    assert decode(spark, ["24:00:00"], codec.pg_time) == [None]


def render_pg_timestamp(v: datetime.datetime) -> str:
    # PG renders 4-digit zero-padded years; strftime("%Y") does not (<1000)
    return f"{v.year:04d}-" + v.strftime("%m-%d %H:%M:%S.%f")


@settings(**SETTINGS)
@given(st.lists(st.datetimes(min_value=datetime.datetime(1, 1, 1), max_value=datetime.datetime(9999, 12, 31, 23, 59, 59)), min_size=1, max_size=30))
def test_timestamp_roundtrip(spark, values):
    got = decode(spark, [render_pg_timestamp(v) for v in values], codec.pg_timestamp)
    assert got == values


def test_timestamp_rejects_invalid_in_grammar(spark):
    # month 99 passes the shape regex but must reject-not-crash (try_cast)
    bad = ["2020-99-99 00:00:00", "999-01-01 00:00:00"]
    assert decode(spark, bad, codec.pg_timestamp) == [None, None]


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.times(),
            st.integers(min_value=-15, max_value=15),  # offset hours
            st.sampled_from([0, 30]),                  # offset minutes
        ),
        min_size=1, max_size=30,
    )
)
def test_timetz_roundtrip(spark, values):
    texts, want = [], []
    for t, oh, om in values:
        sign = "-" if oh < 0 else "+"
        texts.append(f"{t.strftime('%H:%M:%S.%f')}{sign}{abs(oh):02d}:{om:02d}")
        micros = (t.hour * 3600 + t.minute * 60 + t.second) * 1_000_000 + t.microsecond
        offs = (abs(oh) * 3600 + om * 60) * (-1 if oh < 0 else 1)
        want.append((micros, offs))
    got = decode(spark, texts, codec.pg_timetz)
    assert [(g["micros"], g["offset_secs"]) for g in got] == want


# ---------------------------------------------------------------------------
# uuid (text.rs:117-125)
# ---------------------------------------------------------------------------

@settings(**SETTINGS)
@given(st.lists(st.uuids(), min_size=1, max_size=30), st.booleans())
def test_uuid_normalizes_case(spark, values, upper):
    texts = [str(v).upper() if upper else str(v) for v in values]
    got = decode(spark, texts, codec.pg_uuid)
    assert got == [str(v) for v in values]


# ---------------------------------------------------------------------------
# 1-D array literals (text.rs:228; grammar incl. quoting/escapes/bounds)
# ---------------------------------------------------------------------------

_PLAIN = re.compile(r'^[^"\\{},\s]+$')


def render_pg_array(elems: list[str | None]) -> str:
    """Render elements exactly the way PG renders 1-D array literals:
    quote anything empty / containing structural chars / equal to NULL."""
    parts = []
    for e in elems:
        if e is None:
            parts.append("NULL")
        elif _PLAIN.match(e) and e.upper() != "NULL":
            parts.append(e)
        else:
            parts.append('"' + e.replace("\\", "\\\\").replace('"', '\\"') + '"')
    return "{" + ",".join(parts) + "}"


elem = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(blacklist_categories=["Cs"], blacklist_characters="\x00"),
        max_size=12,
    ),
)


@settings(**SETTINGS)
@given(st.lists(st.lists(elem, max_size=8), min_size=1, max_size=10))
def test_array_literal_roundtrip(spark, arrays):
    texts = [render_pg_array(a) for a in arrays]
    got = decode(spark, texts, codec.pg_array_full)
    assert [list(g) if g is not None else None for g in got] == arrays


def test_array_rejects_multidim(spark):
    got = decode(spark, ["{{1,2},{3,4}}"], codec.pg_array_full)
    assert got == [None]


def test_array_explicit_bounds(spark):
    got = decode(spark, ["[0:1]={7,8}"], codec.pg_array_full)
    assert got == [["7", "8"]]


# ---------------------------------------------------------------------------
# sequence keys (event.rs:323-375) — the total-ordering backbone
# ---------------------------------------------------------------------------

@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**38 // (1 << 64) - 1),  # packing domain
            st.integers(min_value=0, max_value=2**32 - 1),  # tx_ordinal
        ),
        min_size=1, max_size=30, unique=True,
    )
)
def test_event_seq_pack_order_and_roundtrip(spark, pairs):
    """event_seq = commit*2^64 + ordinal must be recoverable by divmod and
    must sort exactly like the (commit, ordinal) tuple — including at u64
    boundaries where double precision would corrupt."""
    from etl_spark.envelope import SEQ_SHIFT, event_seq

    df = spark.createDataFrame(
        [(Decimal(c), o) for c, o in pairs], "commit_lsn decimal(20,0), tx_ordinal long"
    ).select(
        "commit_lsn", "tx_ordinal",
        event_seq(F.col("commit_lsn").cast("decimal(38,0)"), "tx_ordinal").alias("seq"),
    )
    rows = df.collect()
    for r in rows:
        c, o = divmod(int(r["seq"]), SEQ_SHIFT)
        assert (c, o) == (int(r["commit_lsn"]), r["tx_ordinal"])
    by_seq = sorted(rows, key=lambda r: int(r["seq"]))
    by_tuple = sorted(rows, key=lambda r: (int(r["commit_lsn"]), r["tx_ordinal"]))
    assert [(r["commit_lsn"], r["tx_ordinal"]) for r in by_seq] == [
        (r["commit_lsn"], r["tx_ordinal"]) for r in by_tuple
    ]


def test_event_seq_domain_guard(spark):
    """Beyond MAX_COMMIT_LSN the decimal packing cannot represent the key;
    check_lsn_domain must flag such rows before they reach event_seq."""
    from etl_spark.envelope import MAX_COMMIT_LSN, check_lsn_domain

    df = spark.createDataFrame(
        [(Decimal(MAX_COMMIT_LSN),), (Decimal(MAX_COMMIT_LSN + 1),)],
        "commit_lsn decimal(38,0)",
    )
    assert check_lsn_domain(df) == 1


def test_event_seq_hex_format(spark):
    from etl_spark.envelope import event_seq_hex

    df = spark.createDataFrame(
        [(255, 16)], "commit_lsn long, start_lsn long"
    ).select(event_seq_hex().alias("h"))
    assert df.first()["h"] == "00000000000000ff/0000000000000010"


# ---------------------------------------------------------------------------
# pgoutput binary-format cell codec (reference fuzz-layer analog for the
# 'b' TupleData path, event.rs:552-680): encode → decode lands on the
# text form the F1-F10 codecs parse, for arbitrary values per OID
# ---------------------------------------------------------------------------

@settings(**SETTINGS)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_binary_int8_roundtrip(v):
    from etl_spark.sources import pgoutput as pgo

    assert pgo.decode_binary_cell(20, pgo.encode_binary_cell(20, v).data) == str(v)


@settings(**SETTINGS)
@given(st.integers(min_value=-(2**31), max_value=2**31 - 1),
       st.integers(min_value=-(2**15), max_value=2**15 - 1))
def test_binary_int4_int2_roundtrip(v4, v2):
    from etl_spark.sources import pgoutput as pgo

    assert pgo.decode_binary_cell(23, pgo.encode_binary_cell(23, v4).data) == str(v4)
    assert pgo.decode_binary_cell(21, pgo.encode_binary_cell(21, v2).data) == str(v2)


@settings(**SETTINGS)
@given(st.floats(allow_subnormal=False))
def test_binary_float8_roundtrip_exact(v):
    """Text form parses back to the bit-identical double (repr is
    shortest-roundtrip; Infinity/NaN take the PG spellings)."""
    import math

    from etl_spark.sources import pgoutput as pgo

    txt = pgo.decode_binary_cell(701, pgo.encode_binary_cell(701, v).data)
    if math.isnan(v):
        assert txt == "NaN"
    elif math.isinf(v):
        assert txt == ("Infinity" if v > 0 else "-Infinity")
    else:
        assert float(txt) == v


@settings(**SETTINGS)
@given(st.binary(max_size=64))
def test_binary_bytea_roundtrip(b):
    from etl_spark.sources import pgoutput as pgo

    txt = pgo.decode_binary_cell(17, pgo.encode_binary_cell(17, b).data)
    assert txt == "\\x" + b.hex()
    assert bytes.fromhex(txt[2:]) == b


@settings(**SETTINGS)
@given(st.text(max_size=80))
def test_binary_text_roundtrip(s):
    from etl_spark.sources import pgoutput as pgo

    assert pgo.decode_binary_cell(25, pgo.encode_binary_cell(25, s).data) == s


@settings(**SETTINGS)
@given(st.integers(min_value=0, max_value=2**128 - 1))
def test_binary_uuid_roundtrip(n):
    import uuid

    from etl_spark.sources import pgoutput as pgo

    u = uuid.UUID(int=n)
    assert pgo.decode_binary_cell(2950, pgo.encode_binary_cell(2950, u).data) == str(u)


@settings(**SETTINGS)
@given(st.dates(min_value=__import__("datetime").date(1, 1, 1),
                max_value=__import__("datetime").date(9999, 12, 31)))
def test_binary_date_roundtrip(d):
    from etl_spark.sources import pgoutput as pgo

    assert pgo.decode_binary_cell(1082, pgo.encode_binary_cell(1082, d).data) == d.isoformat()


@settings(**SETTINGS)
@given(st.datetimes(min_value=__import__("datetime").datetime(1, 1, 1),
                    max_value=__import__("datetime").datetime(9999, 12, 28)))
def test_binary_timestamp_roundtrip(ts):
    from etl_spark.sources import pgoutput as pgo

    txt = pgo.decode_binary_cell(1114, pgo.encode_binary_cell(1114, ts).data)
    # PG trims trailing fractional zeros (binary and text publications of
    # the same value must produce identical destination strings)
    want = ts.strftime("%Y-%m-%d %H:%M:%S")
    if ts.microsecond:
        want += (".%06d" % ts.microsecond).rstrip("0")
    assert txt == want


@settings(**SETTINGS)
@given(st.decimals(allow_nan=False, allow_infinity=False,
                   min_value=Decimal("-1e45"), max_value=Decimal("1e45"),
                   places=None))
def test_binary_numeric_roundtrip(d):
    """Base-10000 numeric wire (numeric.rs:70-100): decode(encode(text))
    reproduces the canonical text, incl. >38-digit magnitudes the Spark
    decimal path would overflow (they stay exact as text)."""
    from etl_spark.sources import pgoutput as pgo

    txt = format(d, "f")  # canonical: no exponent, minimal digits
    got = pgo.decode_binary_cell(1700, pgo.encode_binary_cell(1700, txt).data)
    assert Decimal(got) == Decimal(txt)
    # dscale preserved: same number of fractional digits as the input
    want_scale = len(txt.partition(".")[2])
    assert len(got.partition(".")[2]) == want_scale


def test_binary_numeric_specials_and_scale():
    from etl_spark.sources import pgoutput as pgo

    rt = lambda s: pgo.decode_binary_cell(1700, pgo.encode_binary_cell(1700, s).data)
    assert rt("NaN") == "NaN"
    assert rt("Infinity") == "Infinity"
    assert rt("-Infinity") == "-Infinity"
    assert rt("0.000") == "0.000"          # dscale survives zero
    assert rt("-0.00012000") == "-0.00012000"
    assert rt("10000") == "10000"          # word-boundary magnitudes
    assert rt("99999999") == "99999999"
    assert rt("0.0001") == "0.0001"
    assert rt("0.00009999") == "0.00009999"


@settings(**SETTINGS)
@given(st.times())
def test_binary_time_roundtrip(t):
    from etl_spark.sources import pgoutput as pgo

    txt = pgo.decode_binary_cell(1083, pgo.encode_binary_cell(1083, t).data)
    want = t.strftime("%H:%M:%S")
    if t.microsecond:
        want += (".%06d" % t.microsecond).rstrip("0")
    assert txt == want


@settings(**SETTINGS)
@given(st.times(), st.integers(min_value=-16 * 60, max_value=16 * 60))
def test_binary_timetz_roundtrip_via_text_codec(spark, t, off_min):
    """The decoded timetz text must parse through the text-path codec
    (pg_timetz) to the same (micros, offset) the wire carried — the
    format-agnosticism contract of the binary layer."""
    from etl_spark.sources import pgoutput as pgo

    us = (t.hour * 3600 + t.minute * 60 + t.second) * 1_000_000 + t.microsecond
    off = off_min * 60
    txt = pgo.decode_binary_cell(1266, pgo.encode_binary_cell(1266, (us, off)).data)
    got = decode(spark, [txt], codec.pg_timetz)[0]
    assert (got["micros"], got["offset_secs"]) == (us, off)


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(), st.integers(min_value=-(2**31), max_value=2**31 - 1)),
                max_size=12))
def test_binary_int4_array_roundtrip_via_text_codec(spark, vals):
    """Binary 1-D array decode emits the literal the F9 text parser
    consumes — values and NULLs survive the full wire→literal→typed trip."""
    from etl_spark.sources import pgoutput as pgo

    txt = pgo.decode_binary_cell(1007, pgo.encode_binary_cell(1007, vals).data)
    got = decode(spark, [txt], lambda c: codec.pg_array_simple(c, "int4"))[0]
    assert got == vals


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(), st.text(max_size=12)), max_size=10))
def test_binary_text_array_roundtrip_via_text_codec(spark, vals):
    from etl_spark.sources import pgoutput as pgo

    txt = pgo.decode_binary_cell(1009, pgo.encode_binary_cell(1009, vals).data)
    got = decode(spark, [txt], codec.pg_array_full)[0]
    assert got == vals


# ---------------------------------------------------------------------------
# malformed-frame fuzz (reference fuzz layer 5:
# fuzz/fuzz_targets/parse_copy_row.rs etc. — the codec must REJECT bad
# input with a clean error, never hang, crash the process, or silently
# return garbage). Python analog of "no panic/UB": any mutation of a
# valid pgoutput frame, and arbitrary random bytes, either parse to a
# tagged dict or raise one of the bounded, expected exception types.
# ---------------------------------------------------------------------------

_FRAME_EXCS = (ValueError, IndexError, KeyError, UnicodeDecodeError,
               OverflowError, MemoryError)
try:
    import struct as _struct

    _FRAME_EXCS = _FRAME_EXCS + (_struct.error,)
except ImportError:  # pragma: no cover
    pass


def _valid_frames():
    from etl_spark.sources import pgoutput as pgo

    return [
        pgo.encode_begin(final_lsn=100, commit_ts=7, xid=42),
        pgo.encode_commit(100, 101, commit_ts=7),
        pgo.encode_relation(9, "public", "users", "d",
                            [(1, "pk", 20, -1), (0, "val", 25, -1)]),
        pgo.encode_insert(9, ["1", "a"]),
        pgo.encode_update(9, ["1", "b"], old=["1", "a"]),
        pgo.encode_delete(9, key=["1"]),
        pgo.encode_truncate([9, 10]),
        pgo.encode_type(90001, "public", "mood"),
        pgo.encode_origin(55, "origin_a"),
        pgo.encode_message(77, "prefix", "payload", transactional=True),
    ]


@given(st.data())
@settings(max_examples=400, deadline=1000)
def test_parse_frame_mutation_rejects_cleanly(data):
    """Byte-flip / truncate / extend a VALID frame: parse_frame must
    either return a tagged dict or raise a bounded exception type —
    reject-not-corrupt, and never hang (deadline above)."""
    from etl_spark.sources import pgoutput as pgo

    frames = _valid_frames()
    buf = bytearray(frames[data.draw(st.integers(0, len(frames) - 1))])
    mode = data.draw(st.sampled_from(["flip", "truncate", "extend", "splice"]))
    if mode == "flip" and buf:
        for _ in range(data.draw(st.integers(1, 4))):
            i = data.draw(st.integers(0, len(buf) - 1))
            buf[i] ^= data.draw(st.integers(1, 255))
    elif mode == "truncate":
        buf = buf[: data.draw(st.integers(0, max(len(buf) - 1, 0)))]
    elif mode == "extend":
        buf += data.draw(st.binary(min_size=1, max_size=32))
    else:  # splice random bytes into the middle
        i = data.draw(st.integers(0, len(buf)))
        buf = buf[:i] + data.draw(st.binary(min_size=1, max_size=16)) + buf[i:]
    try:
        out = pgo.parse_frame(bytes(buf))
    except _FRAME_EXCS:
        return  # clean rejection
    assert isinstance(out, dict) and "kind" in out


@given(st.binary(min_size=0, max_size=256))
@settings(max_examples=400, deadline=1000)
def test_parse_frame_random_bytes_reject_cleanly(buf):
    from etl_spark.sources import pgoutput as pgo

    try:
        out = pgo.parse_frame(buf)
    except _FRAME_EXCS:
        return
    assert isinstance(out, dict) and "kind" in out


def test_parse_frame_valid_frames_roundtrip():
    """The unmutated encodings all parse to their own kind (anchors the
    fuzz: the generator really produces valid frames)."""
    from etl_spark.sources import pgoutput as pgo

    kinds = [pgo.parse_frame(f)["kind"] for f in _valid_frames()]
    assert kinds == ["BEGIN", "COMMIT", "RELATION", "INSERT", "UPDATE",
                     "DELETE", "TRUNCATE", "TYPE", "ORIGIN", "MESSAGE"]
