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
