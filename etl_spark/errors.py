"""Typed error taxonomy + retry/remediation policy — the reference's
`crates/etl/src/error.rs` ErrorKind surface and
`crates/etl/src/runtime/error_policy.rs` classification re-expressed.

The point of the taxonomy is OPERATIONAL, not cosmetic: the pipeline
decides per-table whether a failure self-heals on a timer
(``TimedRetry`` — transient connection/timeout classes), needs an
operator (``ManualRetry`` — with a SPECIFIC remediation string, the
same texts the reference ships), or must never be retried
(``NoRetry``). Quarantine previously hard-coded ManualRetry for every
exception; now an :class:`EtlError` (or a classifiable builtin)
carries its kind through to the control-table row — retry_errored's
timed path only fires for genuinely transient classes.
"""

from __future__ import annotations

from enum import Enum

from etl_spark.state import RetryPolicy


class ErrorKind(str, Enum):
    """error.rs:85-150 — one variant per operational failure class."""

    # connection / transient
    SOURCE_CONNECTION_FAILED = "SourceConnectionFailed"
    DESTINATION_CONNECTION_FAILED = "DestinationConnectionFailed"
    SOURCE_QUERY_FAILED = "SourceQueryFailed"
    DESTINATION_QUERY_FAILED = "DestinationQueryFailed"
    DESTINATION_ATOMIC_BATCH_RETRYABLE = "DestinationAtomicBatchRetryable"
    SOURCE_LOCK_TIMEOUT = "SourceLockTimeout"
    DESTINATION_TIMEOUT = "DestinationTimeout"
    SOURCE_OPERATION_CANCELED = "SourceOperationCanceled"
    # schema
    SOURCE_SCHEMA_ERROR = "SourceSchemaError"
    MISSING_TABLE_SCHEMA = "MissingTableSchema"
    CORRUPTED_TABLE_SCHEMA = "CorruptedTableSchema"
    DESTINATION_TABLE_NAME_INVALID = "DestinationTableNameInvalid"
    DESTINATION_NAMESPACE_ALREADY_EXISTS = "DestinationNamespaceAlreadyExists"
    DESTINATION_TABLE_ALREADY_EXISTS = "DestinationTableAlreadyExists"
    DESTINATION_NAMESPACE_MISSING = "DestinationNamespaceMissing"
    DESTINATION_TABLE_MISSING = "DestinationTableMissing"
    DESTINATION_SCHEMA_REWIND = "DestinationSchemaRewind"
    # data
    CONVERSION_ERROR = "ConversionError"
    INVALID_DATA = "InvalidData"
    VALIDATION_ERROR = "ValidationError"
    NULL_IN_ARRAY_UNSUPPORTED = "NullValuesNotSupportedInArrayInDestination"
    UNSUPPORTED_VALUE_IN_DESTINATION = "UnsupportedValueInDestination"
    # config
    CONFIG_ERROR = "ConfigError"
    SOURCE_CONFIGURATION_LIMIT_EXCEEDED = "SourceConfigurationLimitExceeded"
    # io / serde
    IO_ERROR = "IoError"
    SOURCE_IO_ERROR = "SourceIoError"
    DESTINATION_IO_ERROR = "DestinationIoError"
    SERIALIZATION_ERROR = "SerializationError"
    DESERIALIZATION_ERROR = "DeserializationError"
    # auth
    ENCRYPTION_ERROR = "EncryptionError"
    SOURCE_AUTHENTICATION_ERROR = "SourceAuthenticationError"
    DESTINATION_AUTHENTICATION_ERROR = "DestinationAuthenticationError"
    PERMISSION_DENIED = "PermissionDenied"
    # worker / state
    INVALID_STATE = "InvalidState"
    APPLY_WORKER_PANIC = "ApplyWorkerPanic"
    APPLY_WORKER_CANCELLED = "ApplyWorkerCancelled"
    TABLE_SYNC_WORKER_PANIC = "TableSyncWorkerPanic"
    TABLE_COPY_WORKER_PANIC = "TableCopyWorkerPanic"
    TABLE_SYNC_WORKER_CANCELLED = "TableSyncWorkerCancelled"
    STATE_ROLLBACK_ERROR = "StateRollbackError"
    # replication slots / source database
    REPLICATION_SLOT_NOT_FOUND = "ReplicationSlotNotFound"
    REPLICATION_SLOT_ALREADY_EXISTS = "ReplicationSlotAlreadyExists"
    REPLICATION_SLOT_NOT_CREATED = "ReplicationSlotNotCreated"
    REPLICATION_SLOT_INVALIDATED = "ReplicationSlotInvalidated"
    REPLICATION_SLOT_DELETION_TIMEOUT = "ReplicationSlotDeletionTimeout"
    SOURCE_REPLICA_IDENTITY_ERROR = "SourceReplicaIdentityError"
    SOURCE_SNAPSHOT_TOO_OLD = "SourceSnapshotTooOld"
    SOURCE_DATABASE_IN_RECOVERY = "SourceDatabaseInRecovery"
    SOURCE_DATABASE_SHUTDOWN = "SourceDatabaseShutdown"
    # catch-alls
    SOURCE_ERROR = "SourceError"
    DESTINATION_ERROR = "DestinationError"
    UNKNOWN = "Unknown"
    # failpoint kinds (error.rs cfg(failpoints) variants)
    WITH_NO_RETRY = "WithNoRetry"
    WITH_MANUAL_RETRY = "WithManualRetry"
    WITH_TIMED_RETRY = "WithTimedRetry"


class EtlError(RuntimeError):
    """An error with an operational kind (error.rs EtlError shape)."""

    def __init__(self, kind: ErrorKind, detail: str = ""):
        self.kind = kind
        super().__init__(f"[{kind.value}] {detail}" if detail else kind.value)


#: kinds that self-heal on a timer (error_policy.rs Timed arm)
_TIMED = frozenset({
    ErrorKind.SOURCE_CONNECTION_FAILED,
    ErrorKind.DESTINATION_CONNECTION_FAILED,
    ErrorKind.DESTINATION_ATOMIC_BATCH_RETRYABLE,
    ErrorKind.DESTINATION_TIMEOUT,
    ErrorKind.SOURCE_DATABASE_SHUTDOWN,
    ErrorKind.SOURCE_DATABASE_IN_RECOVERY,
    ErrorKind.WITH_TIMED_RETRY,
})

#: error_policy.rs remediation strings — the SAME operator guidance the
#: reference ships, keyed by kind (manual-retry arms with a solution)
_SOLUTIONS: dict[ErrorKind, str] = {
    ErrorKind.SOURCE_AUTHENTICATION_ERROR:
        "Verify source database credentials and authentication token "
        "validity.",
    ErrorKind.DESTINATION_AUTHENTICATION_ERROR:
        "Verify destination credentials and authentication token validity.",
    ErrorKind.SOURCE_SCHEMA_ERROR:
        "Update the Postgres database schema to resolve compatibility "
        "issues.",
    ErrorKind.SOURCE_REPLICA_IDENTITY_ERROR:
        "Configure the affected Postgres table with the least costly "
        "replica identity supported by the destination. Use REPLICA "
        "IDENTITY DEFAULT with a primary key, or USING INDEX when "
        "supported, if stable key values are enough. Use REPLICA IDENTITY "
        "FULL only when the destination needs full old-row images or "
        "complete replacement rows.",
    ErrorKind.NULL_IN_ARRAY_UNSUPPORTED:
        "Remove NULL values from array columns in the Postgres tables.",
    ErrorKind.UNSUPPORTED_VALUE_IN_DESTINATION:
        "Update the value in the Postgres table to make sure it's "
        "compatible.",
    ErrorKind.SOURCE_CONFIGURATION_LIMIT_EXCEEDED:
        "Verify the configured limits for Postgres, for example, the "
        "maximum number of replication slots.",
    ErrorKind.REPLICATION_SLOT_NOT_CREATED:
        "Verify the Postgres database allows creation of new replication "
        "slots.",
    ErrorKind.SOURCE_SNAPSHOT_TOO_OLD:
        "Check replication slot status and database configuration.",
    ErrorKind.DESTINATION_SCHEMA_REWIND:
        "Resynchronize the affected table. The destination schema is "
        "ahead of the replayed replication stream, so the replayed schema "
        "snapshot cannot be applied safely.",
    ErrorKind.TABLE_SYNC_WORKER_PANIC:
        "Inspect the table sync worker panic logs and manually retry the "
        "table.",
    ErrorKind.TABLE_COPY_WORKER_PANIC:
        "Inspect the table copy worker panic logs and manually retry the "
        "table.",
    ErrorKind.WITH_NO_RETRY: "Cannot retry this error.",
    ErrorKind.WITH_MANUAL_RETRY:
        "Manually trigger retry after resolving the issue.",
    ErrorKind.WITH_TIMED_RETRY:
        "Will automatically retry after the configured delay.",
}

#: error_policy.rs default arm — manual, generic guidance
_DEFAULT_SOLUTION = (
    "There is no single prescribed solution for this error. The issue may "
    "still be recoverable with manual intervention based on the specific "
    "context. If it persists after rollback and targeted fixes, please "
    "contact support."
)


def error_handling_policy(exc: BaseException) -> tuple[RetryPolicy, str]:
    """Maps an exception to (retry policy, operator remediation) — the
    build_error_handling_policy analog. Non-:class:`EtlError`
    exceptions classify via :func:`classify_exception` first."""
    kind = exc.kind if isinstance(exc, EtlError) else classify_exception(exc)
    if kind in _TIMED:
        return RetryPolicy.TIMED_RETRY, _SOLUTIONS.get(
            kind, "Will automatically retry after the configured delay.")
    if kind == ErrorKind.WITH_NO_RETRY:
        return RetryPolicy.NO_RETRY, _SOLUTIONS[kind]
    return RetryPolicy.MANUAL_RETRY, _SOLUTIONS.get(kind, _DEFAULT_SOLUTION)


def classify_exception(exc: BaseException) -> ErrorKind:
    """Best-effort kind for exceptions raised outside the typed paths:
    transient transport/timeout classes map to their timed kinds, data
    shape errors to InvalidData, everything else Unknown (→ manual with
    the generic guidance, like the reference's default arm)."""
    if isinstance(exc, EtlError):
        return exc.kind
    # the live source's typed slot failure (import deferred — sources
    # import state/telemetry; errors must stay leaf-level)
    try:
        from etl_spark.sources.live import SlotInvalidated
        if isinstance(exc, SlotInvalidated):
            return ErrorKind.REPLICATION_SLOT_INVALIDATED
    except ImportError:  # pragma: no cover - live module always present
        pass
    if isinstance(exc, (ConnectionError, BrokenPipeError)):
        return ErrorKind.SOURCE_CONNECTION_FAILED
    if isinstance(exc, TimeoutError):
        return ErrorKind.DESTINATION_TIMEOUT
    if isinstance(exc, PermissionError):  # before the OSError superclass
        return ErrorKind.PERMISSION_DENIED
    if isinstance(exc, OSError):
        return ErrorKind.IO_ERROR
    if isinstance(exc, (ValueError, TypeError)):
        return ErrorKind.INVALID_DATA
    return ErrorKind.UNKNOWN
