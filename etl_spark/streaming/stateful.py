"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference guarantees per-key apply ordering and at-least-once delivery
(apply.rs:249-300 progress tracking; architecture.md:119-136 "duplicates
resolved by key+sequence at destinations"). The sinks here already dedup by
``event_seq`` at merge time; this module provides the IN-STREAM variant: a
per-key high-watermark state that drops replayed or out-of-order change
events before they reach any sink — the shape to use when a destination is
append-only or too dumb to merge (webhooks, message buses).

Spark shape: ``groupBy(key).applyInPandasWithState`` — state is the
reference's ``EventSequenceKey {commit_lsn, tx_ordinal}`` (event.rs:323-344)
as two longs, Arrow-batched, managed by the streaming state store. At
cluster scale the state is partitioned by key hash across executors and
checkpointed incrementally; with the RocksDB state store provider it spills
off-heap, so the operator holds 10⁹ keys without executor-memory pressure.
No driver-side anything.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

STATE_SCHEMA = StructType(
    [StructField("max_commit_lsn", LongType()), StructField("max_tx_ordinal", LongType())]
)


def dedup_apply(
    pdfs: Iterator[pd.DataFrame],
    state,
    commit_col: str = "commit_lsn",
    ordinal_col: str = "tx_ordinal",
) -> Iterator[pd.DataFrame]:
    """The per-group dedup kernel (module-level so unit/property tests can
    drive it with a fake GroupState — no streaming query needed).

    Invariants (property-tested): emitted sequences are strictly
    increasing across the group's whole lifetime; nothing emits twice;
    an exact replay of already-seen batches emits nothing.
    """
    c0, o0 = state.get if state.exists else (-1, -1)
    start = (c0, o0)
    for pdf in pdfs:
        fresh = pdf[
            (pdf[commit_col] > c0) | ((pdf[commit_col] == c0) & (pdf[ordinal_col] > o0))
        ].sort_values([commit_col, ordinal_col])
        # same sequence delivered twice inside one batch → keep first
        fresh = fresh[~fresh[[commit_col, ordinal_col]].duplicated(keep="first")]
        if len(fresh):
            tail = fresh.iloc[-1]
            c0, o0 = int(tail[commit_col]), int(tail[ordinal_col])
            yield fresh
    if (c0, o0) > start:
        state.update((c0, o0))


def dedup_by_sequence(
    events: DataFrame,
    key_cols: list[str],
    commit_col: str = "commit_lsn",
    ordinal_col: str = "tx_ordinal",
) -> DataFrame:
    """Exactly-once-ify an at-least-once change stream, per key.

    Emits each group's events strictly in ``(commit_lsn, tx_ordinal)``
    order and drops any event at or below the group's high watermark —
    replays from a restarted producer, duplicated batches, and
    out-of-order stragglers all die here. State survives across
    micro-batches (and restarts, via the checkpoint), so a later replay of
    an already-applied batch is filtered even though it arrives fresh.

    Output schema = input schema, unchanged.
    """
    out_schema = events.schema

    def apply(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        return dedup_apply(pdfs, state, commit_col, ordinal_col)

    return events.groupBy(*key_cols).applyInPandasWithState(
        apply,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
