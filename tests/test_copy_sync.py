"""Round 13: initial table copy over the replication socket (CopyOut
subprotocol) — the reference's table-sync choreography
(crates/etl/src/replication/table_sync/copy.rs over
postgres/client/transaction.rs:328-385 + child.rs:35-45) against the
loopback backend, feeding the gate-proven F10 COPY text codec."""

from __future__ import annotations

import pytest

from etl_spark.sources.snapshot import build_copy_query, snapshot_via_copy
from etl_spark.sources.socket_transport import (
    LoopbackReplicationServer,
    SocketReplicationSource,
)


def test_build_copy_query_reference_shapes():
    """The three ctid partition forms + filter/column-list pushdown of
    build_ctid_copy_query (transaction.rs:28-62)."""
    assert build_copy_query("public.t") == \
        "copy (select * from public.t) to stdout with (format text)"
    assert build_copy_query("public.t", ["a", "b"]) == \
        "copy (select a, b from public.t) to stdout with (format text)"
    # OpenStart / Closed / OpenEnd
    assert "where ctid < '(8,1)'::tid" in \
        build_copy_query("t", ctid_range=(None, "(8,1)"))
    q = build_copy_query("t", ctid_range=("(8,1)", "(16,1)"))
    assert "ctid >= '(8,1)'::tid and ctid < '(16,1)'::tid" in q
    assert "where ctid >= '(16,1)'::tid" in \
        build_copy_query("t", ctid_range=("(16,1)", None))
    # row filter rides inside the copy SQL (P2)
    q = build_copy_query("t", ["a"], row_filter="a > 5",
                         ctid_range=("(0,1)", None))
    assert q == ("copy (select a from t where ctid >= '(0,1)'::tid and "
                 "(a > 5)) to stdout with (format text)")


def test_copy_out_escapes_nulls_and_batching(spark, tmp_path):
    r"""COPY lines with real escapes (\t, \\, \n) and \N NULLs decode
    distributed to the original values; small max_bytes forces multiple
    relayed batches."""
    lines = [
        b"1\talpha\t10.5",
        b"2\thas\\ttab\t\\N",          # value with a literal TAB, NULL bal
        b"3\tback\\\\slash\t-1.25",    # literal backslash
        b"4\tmulti\\nline\t0.0",       # literal newline
        b"5\t\\N\t99.0",               # NULL text cell
    ]
    with LoopbackReplicationServer(b"", tables={"public.t": lines}) as srv:
        src = SocketReplicationSource("127.0.0.1", srv.port)
        out = snapshot_via_copy(
            spark, src, "public.t", "pk long, txt string, bal double",
            str(tmp_path / "copy"), column_list=["pk", "txt", "bal"],
            batch_bytes=16)  # tiny: every line its own relay batch
        src.close()
    got = {r.pk: (r.txt, r.bal) for r in out.collect()}
    assert got == {
        1: ("alpha", 10.5),
        2: ("has\ttab", None),
        3: ("back\\slash", -1.25),
        4: ("multi\nline", 0.0),
        5: (None, 99.0),
    }
    import os
    files = [f for f in os.listdir(str(tmp_path / "copy"))
             if f.endswith(".parquet")]
    assert len(files) >= 2  # batching actually happened


def test_snapshot_transaction_choreography(spark, tmp_path):
    """BEGIN → SET TRANSACTION SNAPSHOT '<exported>' → COPY → COMMIT on
    one connection, in order (child.rs:41 anchoring); a wrong snapshot
    name is rejected by the server."""
    with LoopbackReplicationServer(
            b"", consistent_point=77, snapshot_name="00000003-ab",
            tables={"public.t": [b"1\tx"]}) as srv:
        src = SocketReplicationSource("127.0.0.1", srv.port)
        slot = src.create_slot("s", export_snapshot=True)
        assert slot.snapshot_name == "00000003-ab"
        out = snapshot_via_copy(
            spark, src, "public.t", "pk long, v string",
            str(tmp_path / "c1"), snapshot_name=slot.snapshot_name)
        assert out.count() == 1
        src.close()
        kinds = [c.split()[0].upper() for c in srv.commands]
        assert kinds == ["CREATE_REPLICATION_SLOT", "BEGIN", "SET",
                         "COPY", "COMMIT"]
        assert "00000003-ab" in srv.commands[2]

        bad = SocketReplicationSource("127.0.0.1", srv.port)
        with pytest.raises(RuntimeError, match="invalid snapshot"):
            snapshot_via_copy(
                spark, bad, "public.t", "pk long, v string",
                str(tmp_path / "c2"), snapshot_name="not-the-one")
        bad.close()


def test_copy_unknown_table_is_loud(spark, tmp_path):
    with LoopbackReplicationServer(b"", tables={"public.t": []}) as srv:
        src = SocketReplicationSource("127.0.0.1", srv.port)
        with pytest.raises(RuntimeError, match="relation does not exist"):
            snapshot_via_copy(spark, src, "public.nope", "pk long",
                              str(tmp_path / "c"))
        src.close()


def test_copy_then_stream_same_connection(spark, tmp_path):
    """The handoff: after COMMIT the same connection runs
    START_REPLICATION — copy rows + streamed rows land in one table
    (the cdc_socket_copy_sync gate does this at corpus scale)."""
    from etl_spark.sources import live
    from etl_spark.sources import pgoutput as pgo

    rel = pgo.encode_relation(1, "public", "t", "d",
                              [(1, "pk", 20, -1), (0, "v", 25, -1)])
    msgs = [
        live.encode_xlog_data(5, 6, 0, rel),
        live.encode_xlog_data(10, 11, 0, pgo.encode_begin(12, 1)),
        live.encode_xlog_data(11, 12, 0, pgo.encode_insert(1, ["9", "new"])),
        live.encode_xlog_data(12, 13, 0, pgo.encode_commit(12, 13)),
    ]
    stream = live.encode_copy_stream(msgs)
    with LoopbackReplicationServer(
            stream, consistent_point=6, snapshot_name="snap",
            tables={"public.t": [b"1\told"]}) as srv:
        src = SocketReplicationSource("127.0.0.1", srv.port)
        slot = src.create_slot("s", export_snapshot=True)
        snap = snapshot_via_copy(
            spark, src, "public.t", "pk long, v string",
            str(tmp_path / "copy"), snapshot_name=slot.snapshot_name)
        src.start(slot.slot_name, slot.consistent_point)
        rows = []
        while True:
            b = src.poll_frames(1 << 20)
            if not b:
                break
            rows += b
        src.close()
        assert srv.connections == 1
    assert {r.pk: r.v for r in snap.collect()} == {1: "old"}
    assert [bytes(f[:1]) for _, _, f in rows] == [b"R", b"B", b"I", b"C"]


def test_copy_rows_metric_increments(spark, tmp_path):
    from etl_spark import telemetry

    reg = telemetry.MetricsRegistry()
    with LoopbackReplicationServer(
            b"", tables={"public.t": [b"1\ta", b"2\tb", b"3\tc"]}) as srv:
        src = SocketReplicationSource("127.0.0.1", srv.port, metrics=reg)
        snapshot_via_copy(spark, src, "public.t", "pk long, v string",
                          str(tmp_path / "c")).count()
        src.close()
    assert reg.value(telemetry.ETL_TABLE_COPY_ROWS_TOTAL) == 3


def test_parallel_ctid_copy_over_concurrent_connections(spark, tmp_path):
    """One connection per ctid partition, all anchored to the same
    exported snapshot, relaying disjoint slices concurrently into one
    decode (the reference's max_copy_connections pool)."""
    from etl_spark.sources.snapshot import snapshot_via_copy_parallel

    ranges = [(None, "(8,1)"), ("(8,1)", "(16,1)"), ("(16,1)", None)]
    slices = {
        None: [b"1\ta", b"2\tb"],
        "(8,1)": [b"3\tc", b"4\td"],
        "(16,1)": [b"5\te"],
    }
    with LoopbackReplicationServer(
            b"", consistent_point=9, snapshot_name="snap-p",
            tables={"public.t": slices}) as srv:
        probe = SocketReplicationSource("127.0.0.1", srv.port)
        slot = probe.create_slot("s", export_snapshot=True)
        out = snapshot_via_copy_parallel(
            spark,
            lambda: SocketReplicationSource("127.0.0.1", srv.port),
            "public.t", "pk long, v string", str(tmp_path / "copy"),
            ctid_ranges=ranges, snapshot_name=slot.snapshot_name,
            max_connections=3)
        probe.close()
        got = {r.pk: r.v for r in out.collect()}
        assert got == {1: "a", 2: "b", 3: "c", 4: "d", 5: "e"}
        # one probe + three worker connections, each snapshot-anchored
        assert srv.connections == 4
        anchors = [c for c in srv.commands
                   if c.upper().startswith("SET TRANSACTION SNAPSHOT")]
        assert len(anchors) == 3 and all("snap-p" in a for a in anchors)


def test_parallel_copy_worker_failure_propagates(spark, tmp_path):
    from etl_spark.sources.snapshot import snapshot_via_copy_parallel

    with LoopbackReplicationServer(
            b"", tables={"public.t": {None: [b"1\ta"]}}) as srv:
        with pytest.raises(RuntimeError, match="unknown ctid partition"):
            snapshot_via_copy_parallel(
                spark,
                lambda: SocketReplicationSource("127.0.0.1", srv.port),
                "public.t", "pk long, v string", str(tmp_path / "c"),
                ctid_ranges=[(None, "(8,1)"), ("(99,1)", None)])
