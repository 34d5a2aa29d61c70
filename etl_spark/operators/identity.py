"""Replica-identity semantics: Full | PrimaryKey | AlternativeKey | Missing.

Mirrors the reference's identity model (crates/etl/src/schema.rs:271-280 —
``IdentityType``) and its behavioral matrix
(crates/etl/tests/pipeline_replica_identity.rs):

- **PrimaryKey** (REPLICA IDENTITY DEFAULT, or USING INDEX resolving to the
  PK columns): UPDATEs that do not change the identity carry NO old row;
  identity-changing UPDATEs and DELETEs carry a KEY-ONLY old row (identity
  columns only, in table order).
- **AlternativeKey** (USING INDEX on a distinct unique index): same
  old-row shape, identity = the index's columns.
- **Full** (REPLICA IDENTITY FULL): every UPDATE/DELETE carries the FULL
  old row — which also lets TOAST partials resolve from the old image
  directly (no per-key history window needed).
- **Missing** (REPLICA IDENTITY NOTHING, or no usable identity): updates
  and deletes have no usable row identity. Postgres itself rejects them at
  the source (test: ``none_replica_identity_..._rejects_updates_and_deletes``);
  if such events nonetheless appear, only changelog materialization is
  sound — current-state must be REJECTED, not guessed.

Identity is resolved STRUCTURALLY (schema.rs doc): a USING INDEX identity
whose columns equal the current PK columns IS PrimaryKey — the semantic
question destinations care about, stable across DDL evolution.

All operators here are pure Column algebra (when/coalesce/explode) — they
run inside the scan stage with zero shuffles of their own; the single
keyed shuffle happens in the downstream LWW window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_spark.operators import materialize

#: IdentityType values (schema.rs:271-280, Display spellings :283-292).
IDENTITY_FULL = "full"
IDENTITY_PRIMARY_KEY = "primary_key"
IDENTITY_ALTERNATIVE_KEY = "alternative_key"
IDENTITY_MISSING = "missing"

#: Old-row kinds carried by the envelope (OldTableRow, table_row.rs:193-198).
BEFORE_FULL = "FULL"
BEFORE_KEY = "KEY"
BEFORE_NONE = "NONE"


class IdentityMissingError(ValueError):
    """Raised when an operation requires a row identity the table lacks
    (reference: updates/deletes are rejected under REPLICA IDENTITY
    NOTHING)."""


def resolve_identity(
    mode: str,
    pk_cols: list[str] | None,
    index_cols: list[str] | None = None,
) -> str:
    """Structurally resolve a table's ``IdentityType``.

    ``mode`` is the Postgres replica-identity mode: ``default`` | ``full``
    | ``index`` | ``nothing``. Per schema.rs's doc comment, equivalence is
    structural: ``USING INDEX`` whose columns equal the current primary
    key IS :data:`IDENTITY_PRIMARY_KEY`; only a genuinely distinct unique
    index is :data:`IDENTITY_ALTERNATIVE_KEY`.
    """
    if mode == "full":
        return IDENTITY_FULL
    if mode == "nothing":
        return IDENTITY_MISSING
    if mode == "index":
        if not index_cols:
            return IDENTITY_MISSING
        if pk_cols and set(index_cols) == set(pk_cols):
            return IDENTITY_PRIMARY_KEY
        return IDENTITY_ALTERNATIVE_KEY
    # default: identity is the PK when one exists
    return IDENTITY_PRIMARY_KEY if pk_cols else IDENTITY_MISSING


def identity_columns(
    identity_type: str,
    pk_cols: list[str] | None,
    index_cols: list[str] | None = None,
    all_cols: list[str] | None = None,
) -> list[str]:
    """The columns forming the row identity under ``identity_type``.

    Full → the whole replicated row (``all_cols``); Missing → raises.
    Column order follows the TABLE order, as the reference keeps identity
    rows in table order (test ``using_index_..._keeps_key_rows_in_table_order``).
    """
    if identity_type == IDENTITY_FULL:
        if not all_cols:
            raise ValueError("IDENTITY_FULL requires all_cols")
        return list(all_cols)
    if identity_type == IDENTITY_PRIMARY_KEY:
        if not pk_cols:
            raise ValueError("IDENTITY_PRIMARY_KEY requires pk_cols")
        return list(pk_cols)
    if identity_type == IDENTITY_ALTERNATIVE_KEY:
        if not index_cols:
            raise ValueError("IDENTITY_ALTERNATIVE_KEY requires index_cols")
        return list(index_cols)
    raise IdentityMissingError(
        "table has no usable replica identity (REPLICA IDENTITY NOTHING): "
        "updates and deletes cannot be keyed"
    )


def address_rows(
    events: DataFrame,
    identity_cols: list[str],
    before_prefix: str = "before_",
    op_col: str = "op",
) -> DataFrame:
    """Give every row event a destination address in the identity columns.

    DELETEs (and key-only old rows generally) carry the identity in the
    BEFORE image only — fill the identity columns from
    ``{before_prefix}{col}`` when the new image lacks them. INSERT/UPDATE
    address via the new row. Pure ``coalesce``; no shuffle.
    """
    out = events
    for k in identity_cols:
        bk = before_prefix + k
        if bk in events.columns:
            out = out.withColumn(k, F.coalesce(F.col(k), F.col(bk)))
    return out


def current_state_with_identity(
    events: DataFrame,
    identity_type: str,
    identity_cols: list[str],
    before_prefix: str = "before_",
    seq_col: str = "event_seq",
    op_col: str = "op",
) -> DataFrame:
    """LWW current state honoring the table's replica identity.

    - **Missing** → :class:`IdentityMissingError` (changelog-only table;
      the reference never lets these reach a keyed destination).
    - Otherwise: (1) address DELETEs via the old image
      (:func:`address_rows`); (2) expand identity-changing UPDATEs into
      DELETE(old identity) + UPSERT(new identity) with ``sub_ordinal``
      ordering (:func:`materialize.expand_pk_change` — reference
      bigquery/core.rs:1421-1478); (3) one keyed LWW window.
    """
    if identity_type == IDENTITY_MISSING:
        raise IdentityMissingError(
            "current-state materialization requires a replica identity; "
            "use changelog materialization for identity-missing tables"
        )
    addressed = address_rows(events, identity_cols, before_prefix, op_col)
    expanded = materialize.expand_pk_change(
        addressed, identity_cols, before_prefix=before_prefix,
        seq_col=seq_col, op_col=op_col,
    )
    return materialize.current_state(
        expanded, identity_cols, seq_col=seq_col, op_col=op_col,
        tie_breakers=["sub_ordinal"],
    )


def resolve_toast_from_old_image(
    events: DataFrame,
    value_cols: list[str],
    before_prefix: str = "before_",
) -> DataFrame:
    """TOAST resolution under REPLICA IDENTITY FULL: a partial new image's
    missing cells come straight from the event's own FULL old row
    (reference test ``full_replica_identity_...``: the toast update's old
    row carries the previous large_text) — a zero-shuffle ``coalesce``,
    cheaper than the per-key history window
    (:func:`materialize.resolve_toast`) that key-only identities need."""
    out = events
    for v in value_cols:
        bv = before_prefix + v
        if bv in events.columns:
            out = out.withColumn(v, F.coalesce(F.col(v), F.col(bv)))
    return out


def reject_unkeyable(events: DataFrame, identity_type: str, op_col: str = "op") -> DataFrame:
    """Filter to the events an identity-missing table can legally emit.

    Mirrors the source-side rejection (Postgres errors on UPDATE/DELETE
    under REPLICA IDENTITY NOTHING): only INSERT / TRUNCATE / control
    events survive. For keyed identities this is a no-op."""
    if identity_type != IDENTITY_MISSING:
        return events
    return events.filter(~F.col(op_col).isin("UPDATE", "DELETE"))
