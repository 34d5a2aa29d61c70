"""Live logical-replication source boundary (loud-fail interface stub).

This module is the ONE place that changes when the engine is pointed at
a real Postgres instead of the simulated frame files — see
LIVE_SOURCE.md for the full sim↔live component map. The contract it
must satisfy is deliberately tiny: produce rows of
:data:`etl_spark.sources.pgoutput.FRAME_SCHEMA`
(``wal_start long, xid long, frame binary``) and report ack-gated flush
progress back to the server. Everything downstream (decode, apply,
sinks, recovery) is transport-blind and already driver-gated against
the sim transport.

Reference anchors: ``crates/etl/src/postgres/stream/
replication_message.rs`` (XLogData / keepalive framing),
``client/raw.rs:419-446`` (slot creation / snapshot export),
``postgres/stream/mod.rs`` ``send_status_update`` (monotonic write/flush
reporting).

No Postgres client library ships in this environment, so the concrete
implementation raises loudly instead of pretending: constructing it is
fine (so wiring can be configured and unit-tested), but any method that
would need a socket fails with an actionable message.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass


@dataclass
class SlotInfo:
    """Result of slot creation (client/raw.rs CreateSlotResult analog).

    ``consistent_point`` seeds the snapshot↔stream handoff exactly like
    the sim's ``consistent_lsn``; ``snapshot_name`` (when exported) pins
    the table-copy transaction to the slot's snapshot."""

    slot_name: str
    consistent_point: int
    snapshot_name: str | None = None


class ReplicationFrameSource(ABC):
    """Transport interface: live twin of the sim's frame files.

    An implementation delivers each XLogData message as one
    ``(wal_start, xid, frame)`` row — micro-batched into whatever
    file/queue the pipeline's structured stream reads — and forwards
    flush-LSN acks as standby status updates. The engine never calls
    anything else."""

    @abstractmethod
    def create_slot(self, slot_name: str, export_snapshot: bool = False) -> SlotInfo:
        """CREATE_REPLICATION_SLOT (idempotent probe-then-create)."""

    @abstractmethod
    def start(self, slot_name: str, start_lsn: int) -> None:
        """START_REPLICATION from ``start_lsn`` (the engine's durable
        ``ControlStore.flush_lsn`` — never ahead of the destination ack)."""

    @abstractmethod
    def poll_frames(self, max_bytes: int) -> list[tuple[int, int, bytes]]:
        """Drain up to ``max_bytes`` of XLogData into
        ``(wal_start, xid, frame)`` rows. Keepalives with
        ``reply_requested`` must trigger :meth:`send_status_update`
        internally (replication_message.rs PrimaryKeepAlive)."""

    @abstractmethod
    def send_status_update(self, write_lsn: int, flush_lsn: int) -> None:
        """Standby status update — monotonic, ack-gated (stream/mod.rs
        ``send_status_update``; the engine arms the same-named failpoint
        in its sim pipeline)."""


class PostgresReplicationSource(ReplicationFrameSource):
    """Loud-fail stub: the concrete live transport.

    Constructing it records the DSN/slot wiring (testable); every
    socket-touching method raises with the exact reason and what a real
    implementation needs, instead of silently simulating."""

    _REASON = (
        "live Postgres replication transport is not implemented in this "
        "environment (no Postgres client library is installed). Implement "
        "ReplicationFrameSource against psycopg's replication protocol "
        "support: CREATE_REPLICATION_SLOT / START_REPLICATION / standby "
        "status updates — see LIVE_SOURCE.md for the component map and "
        "reference anchors. Everything downstream of FRAME_SCHEMA rows "
        "already works unchanged."
    )

    def __init__(self, dsn: str, publication: str):
        self.dsn = dsn
        self.publication = publication

    def create_slot(self, slot_name: str, export_snapshot: bool = False) -> SlotInfo:
        raise NotImplementedError(self._REASON)

    def start(self, slot_name: str, start_lsn: int) -> None:
        raise NotImplementedError(self._REASON)

    def poll_frames(self, max_bytes: int) -> list[tuple[int, int, bytes]]:
        raise NotImplementedError(self._REASON)

    def send_status_update(self, write_lsn: int, flush_lsn: int) -> None:
        raise NotImplementedError(self._REASON)


# ---------------------------------------------------------------------------
# Copy-both wire framing (round-11: the transport boundary, one layer down)
#
# Byte layouts are the public PostgreSQL frontend/backend protocol
# (protocol.sgml "Streaming Replication Protocol"; the reference consumes
# the same shapes via postgres_replication::protocol —
# crates/etl/src/postgres/stream/replication_message.rs:1-245):
#
#   XLogData        'w' + Int64 wal_start + Int64 wal_end + Int64 clock + data
#   PrimaryKeepAlive 'k' + Int64 wal_end + Int64 clock + Byte1 reply_requested
#   StandbyStatusUpdate (sent by us)
#                   'r' + Int64 write + Int64 flush + Int64 apply
#                       + Int64 clock + Byte1 reply_requested
#
# Each message is one CopyData payload; a RECORDED stream is the CopyBoth
# byte sequence as captured off the socket: 'd' + Int32 length (incl. the
# length field itself, excl. the tag) + payload, concatenated. All
# integers are big-endian; the clock is microseconds since 2000-01-01
# (the PG epoch).
# ---------------------------------------------------------------------------

import struct

#: PG epoch (2000-01-01 UTC) in unix microseconds — clock fields in the
#: replication protocol count from here, not from the unix epoch.
POSTGRES_EPOCH_US = 946_684_800_000_000


def encode_xlog_data(wal_start: int, wal_end: int, clock_us: int, frame: bytes) -> bytes:
    """One XLogData message ('w'): the wrapper a live server puts around
    every pgoutput frame."""
    return b"w" + struct.pack(">qqq", wal_start, wal_end, clock_us) + frame


def encode_keepalive(wal_end: int, clock_us: int, reply_requested: bool = False) -> bytes:
    """PrimaryKeepAlive ('k'): server heartbeat; ``reply_requested`` asks
    the client for an immediate standby status update."""
    return b"k" + struct.pack(">qqB", wal_end, clock_us, 1 if reply_requested else 0)


def encode_status_update(
    write_lsn: int,
    flush_lsn: int,
    apply_lsn: int,
    clock_us: int,
    reply_requested: bool = False,
) -> bytes:
    """StandbyStatusUpdate ('r'): the ack we send back — flush_lsn is the
    engine's durable ``ControlStore.flush_lsn`` (never ahead of the
    destination ack; stream/mod.rs ``send_status_update``)."""
    return b"r" + struct.pack(
        ">qqqqB", write_lsn, flush_lsn, apply_lsn, clock_us,
        1 if reply_requested else 0,
    )


def parse_copy_payload(payload: bytes) -> dict:
    """Parse one CopyData payload from the replication stream.

    Returns ``{"kind": "XLogData", wal_start, wal_end, clock, frame}``,
    ``{"kind": "KeepAlive", wal_end, clock, reply_requested}`` or
    ``{"kind": "StatusUpdate", write_lsn, flush_lsn, apply_lsn, clock,
    reply_requested}`` ('r' appears when parsing a recorded CLIENT side).
    Unknown tags fail loudly — a desynced stream must never be skipped
    over silently."""
    tag = payload[:1]
    if tag == b"w":
        if len(payload) < 25:
            raise ValueError(f"truncated XLogData: {len(payload)} bytes")
        ws, we, clk = struct.unpack_from(">qqq", payload, 1)
        return {"kind": "XLogData", "wal_start": ws, "wal_end": we,
                "clock": clk, "frame": payload[25:]}
    if tag == b"k":
        if len(payload) != 18:
            raise ValueError(f"malformed keepalive: {len(payload)} bytes")
        we, clk, rr = struct.unpack_from(">qqB", payload, 1)
        return {"kind": "KeepAlive", "wal_end": we, "clock": clk,
                "reply_requested": bool(rr)}
    if tag == b"r":
        if len(payload) != 34:
            raise ValueError(f"malformed status update: {len(payload)} bytes")
        w, fl, ap, clk, rr = struct.unpack_from(">qqqqB", payload, 1)
        return {"kind": "StatusUpdate", "write_lsn": w, "flush_lsn": fl,
                "apply_lsn": ap, "clock": clk, "reply_requested": bool(rr)}
    raise ValueError(f"unknown replication message tag: {tag!r}")


def encode_copy_stream(payloads: list[bytes]) -> bytes:
    """Wrap message payloads as a recorded CopyBoth byte stream:
    'd' + Int32 length (self-inclusive, tag-exclusive) + payload each."""
    return b"".join(
        b"d" + struct.pack(">i", len(p) + 4) + p for p in payloads
    )


def iter_copy_messages(stream: bytes):
    """Split a recorded CopyBoth byte stream back into CopyData payloads.

    Strict framing: any leftover/garbage bytes raise — a recorded stream
    that doesn't parse end-to-end is corrupt, and resynchronizing by
    scanning would silently drop WAL."""
    pos, n = 0, len(stream)
    while pos < n:
        tag = stream[pos : pos + 1]
        if tag != b"d":
            raise ValueError(
                f"recorded stream desync at byte {pos}: tag {tag!r} (want 'd')"
            )
        if pos + 5 > n:
            raise ValueError(f"truncated CopyData header at byte {pos}")
        (ln,) = struct.unpack_from(">i", stream, pos + 1)
        end = pos + 1 + ln  # ln includes the length field itself
        if ln < 4 or end > n:
            raise ValueError(f"truncated CopyData body at byte {pos}: len={ln}")
        yield stream[pos + 5 : end]
        pos = end


class RecordedReplicationSource(ReplicationFrameSource):
    """`ReplicationFrameSource` over a RECORDED copy-both byte stream —
    the wire-level transport minus the socket. Everything a live
    implementation does off the socket happens here for real: CopyData
    framing, XLogData unwrap, keepalive handling (reply_requested →
    standby status update), BEGIN/COMMIT-scoped xid tracking, monotonic
    flush reporting. A live source replaces ONLY the byte feed.

    xid tracking mirrors the server's serialization: pgoutput (protocol
    v1, non-streamed) delivers whole transactions back-to-back, so the
    xid of every frame between a BEGIN and its COMMIT is the BEGIN's
    xid (replication_message.rs feeds the same sequential stream).
    Frames outside any transaction (RELATION/TYPE re-sent on
    reconnect, keepalive-adjacent metadata) carry xid = -1, exactly the
    sim's convention.
    """

    def __init__(self, recorded: bytes, slot: SlotInfo | None = None):
        self._recorded = recorded
        self._slot = slot or SlotInfo(slot_name="recorded", consistent_point=0)
        self._messages = None  # armed by start()
        self._pos = 0
        self._current_xid = -1
        self._last_wal_end = 0
        self._write_lsn = 0
        self._flush_lsn = 0
        #: every standby status update sent, as raw 'r' payload bytes —
        #: byte-checkable by tests, flushable by a live subclass
        self.sent_updates: list[bytes] = []
        #: deterministic clock for reproducible tests; a live source uses
        #: wall time. Monotonic counter, PG-epoch based.
        self._clock_us = 0

    # -- ReplicationFrameSource ------------------------------------------
    def create_slot(self, slot_name: str, export_snapshot: bool = False) -> SlotInfo:
        return SlotInfo(
            slot_name=slot_name,
            consistent_point=self._slot.consistent_point,
            snapshot_name=self._slot.snapshot_name if export_snapshot else None,
        )

    def start(self, slot_name: str, start_lsn: int) -> None:
        """Materialize the message list and position the stream for
        replay from ``start_lsn`` at TRANSACTION granularity.

        Postgres re-sends WHOLE transactions whose COMMIT is past the
        slot's confirmed point — a transaction that began before the
        flush point but committed after is re-delivered in full,
        including frames whose own wal positions sit BELOW ``start_lsn``
        (logical decoding delivers in commit order; the confirmed LSN
        fences commits, not individual records). So positioning skips
        only (a) transactions whose COMMIT wal_start < start_lsn and
        (b) stale keepalives — never individual records, and never
        out-of-transaction metadata (RELATION/TYPE re-send per
        connection, so a recorded capture's metadata must survive the
        skip)."""
        msgs = list(iter_copy_messages(self._recorded))
        kept: list[bytes] = []
        tx_buf: list[bytes] = []  # current transaction, held until verdict
        in_tx = False
        for m in msgs:
            p = parse_copy_payload(m)
            if p["kind"] == "KeepAlive":
                if in_tx:
                    # heartbeats interleaved inside a transaction ride its
                    # buffer: delivered iff the transaction is
                    tx_buf.append(m)
                elif p["wal_end"] >= start_lsn:
                    kept.append(m)
                continue
            if p["kind"] != "XLogData":
                raise ValueError(f"server stream carried a {p['kind']} message")
            tag = p["frame"][:1]
            if tag == b"B":
                in_tx = True
                tx_buf = [m]
            elif in_tx:
                tx_buf.append(m)
                if tag == b"C":
                    # fence on the COMMIT's position: < start_lsn means
                    # the whole transaction is confirmed server-side
                    if p["wal_start"] >= start_lsn:
                        kept.extend(tx_buf)
                    tx_buf = []
                    in_tx = False
            else:
                kept.append(m)  # out-of-tx metadata always re-delivers
        kept.extend(tx_buf)  # trailing open transaction (no COMMIT yet)
        self._messages = kept
        self._pos = 0
        self._current_xid = -1

    def poll_frames(self, max_bytes: int) -> list[tuple[int, int, bytes]]:
        if self._messages is None:
            raise RuntimeError("poll_frames before start()")
        out: list[tuple[int, int, bytes]] = []
        budget = 0
        while self._pos < len(self._messages) and budget < max_bytes:
            p = parse_copy_payload(self._messages[self._pos])
            self._pos += 1
            self._clock_us += 1
            if p["kind"] == "KeepAlive":
                self._last_wal_end = max(self._last_wal_end, p["wal_end"])
                if p["reply_requested"]:
                    self.send_status_update(self._last_wal_end, self._flush_lsn)
                continue
            frame = p["frame"]
            self._last_wal_end = max(self._last_wal_end, p["wal_end"])
            tag = frame[:1]
            if tag == b"B":
                # synthetic xid = the BEGIN's wal position: unique and
                # replay-stable at any volume, where the wire xid field
                # is u32 and WRAPS (same convention as assign_xids —
                # transaction identity rides the envelope xid column)
                self._current_xid = p["wal_start"]
            out.append((p["wal_start"], self._current_xid, frame))
            if tag == b"C":
                self._current_xid = -1
            budget += len(frame)
        if out:
            from etl_spark import telemetry

            telemetry.DEFAULT.inc(
                telemetry.ETL_REPLICATION_MESSAGES_TOTAL, len(out))
        return out

    def send_status_update(self, write_lsn: int, flush_lsn: int) -> None:
        # monotonic, ack-gated (stream/mod.rs send_status_update clamps
        # regressions rather than reporting a flush position moving back)
        self._write_lsn = max(self._write_lsn, write_lsn)
        self._flush_lsn = max(self._flush_lsn, flush_lsn)
        self.sent_updates.append(
            encode_status_update(
                self._write_lsn, self._flush_lsn, self._flush_lsn,
                self._clock_us, reply_requested=False,
            )
        )
        from etl_spark import telemetry

        telemetry.DEFAULT.inc(telemetry.ETL_STATUS_UPDATES_TOTAL)


# ---------------------------------------------------------------------------
# Distributed wire decode (recorded stream chunks → FRAME_SCHEMA rows)
#
# A replication connection is one serialized byte stream, but a RECORDED
# stream (capture files, queue segments) splits into message-aligned
# chunks that unwrap in parallel: framing is per-message stateless, and
# the one cross-message fact — which transaction a frame belongs to —
# recovers from BEGIN positions alone, because pgoutput (protocol v1,
# non-streamed) never interleaves transactions: every frame between a
# BEGIN and the next BEGIN belongs to the earlier one. So xid assignment
# is "latest BEGIN at wal_start <= mine": a driver-side collect of the
# BEGIN frames (bounded by transaction count, the TxRegistry pattern —
# pgoutput.py PersistentTxRegistry.advance_from) + a vectorized
# searchsorted over the broadcast begin positions. No global sort, no
# single-partition window.
# ---------------------------------------------------------------------------


def unwrap_xlog_chunks(chunks, chunk_col: str = "chunk"):
    """Message-aligned recorded-stream chunks → ``(wal_start, frame)``.

    Each input row carries one CopyBoth byte-stream chunk; the Arrow-
    batched kernel splits CopyData framing and XLogData wrappers.
    Keepalives are transport-level (their reply contract lives in
    :class:`RecordedReplicationSource`) and carry no WAL data — dropped.
    A chunk that does not parse end-to-end raises (strict framing:
    resynchronizing by scanning would silently drop WAL)."""

    def go(batches):
        import pandas as pd

        for pdf in batches:
            ws: list[int] = []
            frames: list[bytes] = []
            for blob in pdf[chunk_col]:
                for payload in iter_copy_messages(bytes(blob)):
                    p = parse_copy_payload(payload)
                    if p["kind"] == "KeepAlive":
                        continue
                    if p["kind"] != "XLogData":
                        raise ValueError(
                            f"server stream carried a {p['kind']} message"
                        )
                    ws.append(p["wal_start"])
                    frames.append(p["frame"])
            yield pd.DataFrame({"wal_start": ws, "frame": frames})

    return chunks.mapInPandas(go, schema="wal_start long, frame binary")


def assign_xids(frames, frame_col: str = "frame", lsn_col: str = "wal_start"):
    """Recover the transaction of every frame from BEGIN positions and
    add it as the ``xid`` column (completing FRAME_SCHEMA).

    The assigned xid is the BEGIN's WAL POSITION, not the wire xid
    field: the wire field is u32 and wraps (PG xid semantics), so two
    distant transactions in one decode window could collide under it —
    the begin position is unique at any volume, stable under replay and
    window re-slicing, and transaction identity rides the envelope xid
    column (int64), exactly the sim's convention (workload.py
    pgoutput_decode: "the wire field is informational"; the sequential
    :class:`RecordedReplicationSource` assigns the same value, so both
    decode paths produce identical FRAME_SCHEMA rows). Frames before the
    first BEGIN (re-sent RELATION/TYPE metadata) get xid = -1. The BEGIN
    collect is bounded by transaction count per decode window, never
    frame volume."""
    from pyspark.sql import functions as F

    first = F.substring(F.col(frame_col).cast("binary"), 1, 1)
    begins = (
        frames.filter(first == F.lit(b"B"))
        .select(lsn_col)
        .collect()
    )
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    b_wal = np.sort(np.array([int(r[0]) for r in begins], dtype=np.int64))

    def _xid_of(ws):
        idx = np.searchsorted(b_wal, ws.to_numpy(dtype=np.int64), side="right") - 1
        wal = b_wal[np.maximum(idx, 0)] if len(b_wal) else np.zeros(len(ws), dtype=np.int64)
        return pd.Series(np.where(idx >= 0, wal, -1))

    _xid_of.__annotations__ = {"ws": pd.Series, "return": pd.Series}
    xid_of = pandas_udf(_xid_of, "long")

    return frames.withColumn("xid", xid_of(F.col(lsn_col)))


class FrameFilePump:
    """Bridge a :class:`ReplicationFrameSource` into the pipeline's
    micro-batched file queue — the piece LIVE_SOURCE.md's component map
    describes as "ship each XLogData message as one (wal_start, xid,
    frame) row into the same micro-batched file/queue the sim writes".

    Each :meth:`drain_once` polls the transport, writes one flat
    FRAME_SCHEMA parquet file into the pipeline's source directory
    (atomic move — the file stream never sees a partial file), and — the
    ack-gated half — reports the ENGINE's durable flush LSN back to the
    transport as a standby status update. The write position (how far
    the pump has shipped) and the flush position (how far the
    destination has acked, read from the pipeline's ControlStore) are
    deliberately different numbers: a crash between them replays from
    the slot, and the engine's at-least-once machinery absorbs it.

    Driver-side by design: one replication connection is a single
    serialized byte stream (the reference's apply worker consumes it on
    one task too, worker.rs:366-430); Spark parallelism begins at the
    decode, not the transport.
    """

    def __init__(self, source: ReplicationFrameSource, spark, source_dir: str,
                 control=None, batch_bytes: int = 8 << 20):
        import os
        import re

        self.source = source
        self.spark = spark
        self.source_dir = source_dir
        self.control = control  # ControlStore-like: .flush_lsn
        self.batch_bytes = batch_bytes
        # Resume numbering AFTER any file a previous incarnation shipped:
        # Spark's file-stream checkpoint marks paths as seen, so a restart
        # that reused pump000001.parquet would have its replayed frames
        # silently ignored (the at-least-once replay would be LOST). Names
        # must be unique across incarnations of the same queue.
        existing = [
            int(m.group(1))
            for f in (os.listdir(source_dir) if os.path.isdir(source_dir) else [])
            if (m := re.fullmatch(r"pump(\d+)\.parquet", f))
        ]
        self._n = max(existing, default=0)
        self._write_pos = 0  # highest wal_start shipped to the queue

    def drain_once(self) -> int:
        """Poll one transport batch into one frame file; returns the row
        count (0 = transport idle, nothing written)."""
        import os
        import shutil

        rows = self.source.poll_frames(self.batch_bytes)
        if not rows:
            return 0
        self._write_pos = max(self._write_pos, max(w for w, _, _ in rows))
        self._n += 1
        name = f"pump{self._n:06d}"
        staging = os.path.join(self.source_dir, f".__pump_stage_{name}")
        df = self.spark.createDataFrame(
            [(w, x, bytearray(f)) for w, x, f in rows],
            "wal_start long, xid long, frame binary",
        )
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = next(p for p in os.listdir(staging) if p.endswith(".parquet"))
        shutil.move(os.path.join(staging, part),
                    os.path.join(self.source_dir, f"{name}.parquet"))
        shutil.rmtree(staging)
        return len(rows)

    def report_progress(self) -> None:
        """Standby status update from the engine's DURABLE flush LSN —
        never ahead of the destination ack (T4; stream/mod.rs
        send_status_update semantics)."""
        flush = int(self.control.flush_lsn) if self.control is not None else 0
        self.source.send_status_update(max(flush, self._write_pos), flush)

    def run_until_source_drained(self, pipeline) -> None:
        """Pump → drain → ack loop until the transport is exhausted: the
        batch-mode analog of the live loop (poll, let the pipeline apply,
        report the advanced flush LSN)."""
        while self.drain_once() > 0:
            pipeline.run_until_drained()
            self.report_progress()
